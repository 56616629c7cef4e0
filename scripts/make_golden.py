#!/usr/bin/env python
"""Generate the committed golden fidelity fixture for bench.py.

Exports a deterministic jax-init of the flagship config's generator into the
*actual* reference torch SynthesizerTrn (/root/reference/models.py), runs its
``infer`` on a fixed mel with pinned prior noise, and writes
``tests/fixtures/golden_iitp_base.npz`` holding (mel, eps, wav_ref).
bench.py then re-synthesizes the same input on TPU each run and reports
``mel_l1_vs_reference`` on-device -- the BASELINE.json fidelity metric
(mel-L1 <= 1e-2), driver-visible and independent of the reference mount.

The fixture's weights are regenerated in bench.py from the same jax PRNG keys
(1, 2) -- jax's threefry is platform-independent, so TPU and CPU inits agree
bitwise. Regenerate this fixture if the weight init recipe or jax's PRNG
implementation ever changes.

Usage: JAX_PLATFORMS=cpu python scripts/make_golden.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
import torch

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.utils.golden import (
    NOISE_SCALE,
    fidelity_inputs,
    fidelity_params,
)
from smart_vocoder_tpu.utils.torch_compat import torch_state_dict_from_params


def main():
    hps = load_config(os.path.join(_REPO, "configs", "iitp_base.json"))

    mel, lens, eps = fidelity_inputs(hps)
    T = mel.shape[1]
    spec = jnp.zeros((1, T, hps.data.filter_length // 2 + 1))
    params = fidelity_params(hps, mel, lens, spec, folded=False)

    sys.path.insert(0, "/root/reference")
    import models as ref_models

    tnet = ref_models.SynthesizerTrn(
        hps.data.filter_length // 2 + 1,
        hps.train.segment_size // hps.data.hop_length,
        inter_channels=hps.model.inter_channels,
        hidden_channels=hps.model.hidden_channels,
        filter_channels=hps.model.filter_channels,
        n_heads=hps.model.n_heads,
        n_layers=hps.model.n_layers,
        kernel_size=hps.model.kernel_size,
        p_dropout=hps.model.p_dropout,
        resblock=hps.model.resblock,
        resblock_kernel_sizes=hps.model.resblock_kernel_sizes,
        resblock_dilation_sizes=hps.model.resblock_dilation_sizes,
        upsample_rates=hps.model.upsample_rates,
        upsample_initial_channel=hps.model.upsample_initial_channel,
        upsample_kernel_sizes=hps.model.upsample_kernel_sizes,
        n_speakers=hps.data.n_speakers,
        gin_channels=hps.model.gin_channels,
    )
    tnet.eval()

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in torch_state_dict_from_params(params).items()}
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    # cond_layer / dec.cond exist in the torch graph (gin_channels=256 is
    # plumbed everywhere) but are dead with g=None (models.py:318/:332).
    live = [k for k in missing if "cond" not in k]
    assert not live, f"live reference params not covered by export: {live}"
    assert not unexpected, unexpected
    print(f"loaded {len(sd)} tensors; inert-missing {len(missing)} (cond_*)")

    eps_t = torch.from_numpy(np.asarray(eps).transpose(0, 2, 1))  # (1, C, T)
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x, **kw: eps_t  # pin the prior noise
    try:
        with torch.no_grad():
            wav, _, _ = tnet.infer(
                torch.from_numpy(np.asarray(mel).transpose(0, 2, 1)),
                torch.from_numpy(np.asarray(lens)),
                noise_scale=NOISE_SCALE,
            )
    finally:
        torch.randn_like = orig_randn_like

    wav_ref = wav.numpy()[0, 0].astype(np.float32)
    out = os.path.join(_REPO, "tests", "fixtures", "golden_iitp_base.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        mel=np.asarray(mel, np.float32),
        eps=np.asarray(eps, np.float32),
        wav_ref=wav_ref,
        noise_scale=np.float32(NOISE_SCALE),
        jax_version=np.str_(jax.__version__),
    )
    print(f"wrote {out}: wav_ref {wav_ref.shape} "
          f"rms {np.sqrt((wav_ref**2).mean()):.4f}, "
          f"{os.path.getsize(out)/1e3:.0f} kB")


if __name__ == "__main__":
    main()
