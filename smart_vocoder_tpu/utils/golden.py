"""The shared weight recipe behind the committed fidelity fixture.

bench.py regenerates these params every run and compares its synthesis
against ``tests/fixtures/golden_iitp_base.npz``, which scripts/make_golden.py
produced by exporting the SAME params into the reference torch SynthesizerTrn
(/root/reference/models.py) -- so the two sides must build weights
identically, from one function.

The ``conv_post`` gain boost exists because a freshly-initialized generator
emits near-silence (waveform rms ~0.011): most log-mel bins then sit at the
``log(clamp(., 1e-5))`` dynamic-range floor (ops/stft.py, reference
mel_processing.py:19-25), where the clamp asymmetry inflates mel-L1 to ~1e-2
even between f32 implementations that agree to 1e-3 on the waveform. Boosting
the (linear, pre-tanh) output projection puts the spectrum at speech-like
levels so the metric measures implementation parity, not clamp noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CONV_POST_GAIN = 30.0  # output rms ~0.011 -> ~0.3, well above the mel floor
INIT_KEYS = (1, 2)
MEL_KEY = 0
EPS_KEY = 4
NOISE_SCALE = 0.667  # the notebook's synthesis setting (inference.ipynb cell 4)
FRAMES = 200         # fixture length (~2.3 s at hop 256)


def fidelity_params(hps, mel, lens, spec, folded: bool = True):
    """Deterministic full-size params: weight-norm init from keys (1, 2) with
    the conv_post gain boost (conv_post is un-normed in both frameworks, so
    the boost is one plain-weight scale). ``folded=True`` (bench/serving)
    bakes weight norm away; ``folded=False`` keeps weight_v/weight_g for the
    torch export. Identical effective weights either way, and identical bits
    on CPU and TPU (threefry is platform-independent)."""
    from smart_vocoder_tpu.models import build_synthesizer
    from smart_vocoder_tpu.nn import fold_weight_norm

    net_wn = build_synthesizer(hps, weight_norm=True)

    def init(k1, k2):
        params = net_wn.init(k1, mel, lens, spec, lens, k2)["params"]
        params["dec"]["conv_post"]["weight"] = (
            params["dec"]["conv_post"]["weight"] * CONV_POST_GAIN)
        if folded:
            params = fold_weight_norm(params)
        return params

    return jax.jit(init)(jax.random.key(INIT_KEYS[0]), jax.random.key(INIT_KEYS[1]))


def fidelity_inputs(hps):
    """The fixture's (mel, lens, eps): fixed keys, fixture length."""
    mel = jax.random.normal(jax.random.key(MEL_KEY), (1, FRAMES, 80)) * 2.0 - 4.0
    lens = jnp.full((1,), FRAMES, jnp.int32)
    eps = jax.random.normal(jax.random.key(EPS_KEY),
                            (1, FRAMES, hps.model.inter_channels), jnp.float32)
    return mel, lens, eps
