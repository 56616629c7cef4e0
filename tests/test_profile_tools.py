"""Unit tests for the train-step profiling toolchain (scripts/)."""

import importlib.util
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:  # tensorflow proto stack optional
        pytest.skip(f"deps unavailable: {e}")
    return mod


@pytest.mark.fast
class TestPhaseClassifier:
    """classify() attributes HLO op_name paths to model phases. The backward
    scope reads `transpose(jvp(X))/sub` -- note the extra `)` -- so needles
    must match after normalization (a plain substring check silently dumped
    all generator backward time into 'G other')."""

    def test_forward_and_backward_split(self):
        m = _load("train_phase_profile")
        fwd = "jit(train_step)/jvp(SynthesizerTrn)/dec/resblocks_9/conv"
        bwd = "jit(train_step)/transpose(jvp(SynthesizerTrn))/dec/resblocks_9/conv"
        assert m.classify(fwd) == "G fwd: dec"
        assert m.classify(bwd) == "G bwd: dec"

    def test_discriminator_and_misc(self):
        m = _load("train_phase_profile")
        assert m.classify(
            "jit(train_step)/jvp(MultiPeriodDiscriminator)/discriminators_0/convs_3"
        ) == "D fwd (2 applies)"
        assert m.classify(
            "jit(train_step)/transpose(jvp(MultiPeriodDiscriminator))/discriminators_2/x"
        ) == "D bwd"
        assert m.classify("jit(train_step)/jvp(jit(fft))/mul") == "STFT in loss"
        assert m.classify("jit(train_step)/add") == "opt/losses/other"

    def test_every_generator_submodule_has_fwd_and_bwd(self):
        m = _load("train_phase_profile")
        for sub in ("enc_p", "enc_q", "flow", "dec"):
            f = f"jit(train_step)/jvp(SynthesizerTrn)/{sub}/x"
            b = f"jit(train_step)/transpose(jvp(SynthesizerTrn))/{sub}/x"
            assert m.classify(f) == f"G fwd: {sub}"
            assert m.classify(b) == f"G bwd: {sub}"


@pytest.mark.fast
class TestPerStageClassifiers:
    """--per-dec / --per-disc classifiers (round 4): decoder ops live under
    jvp(SynthesizerTrn)/dec/... (NOT jvp(Generator) -- the train step applies
    the whole SynthesizerTrn), discriminator ops under
    jvp(MultiPeriodDiscriminator)/discriminators_i/..."""

    def test_per_dec_stages(self):
        m = _load("train_phase_profile")
        base = "jit(train_step)/jvp(SynthesizerTrn)/dec"
        assert m.classify_per_dec(f"{base}/conv_pre/kernel") == "conv_pre fwd"
        assert m.classify_per_dec(f"{base}/ups_2/conv") == "ups_2 fwd"
        # resblocks_{3i..3i+2} form the MRF of stage i
        assert m.classify_per_dec(f"{base}/resblocks_0/convs1_0") == "s0/mrf fwd"
        assert m.classify_per_dec(f"{base}/resblocks_5/convs2_1") == "s1/mrf fwd"
        assert m.classify_per_dec(f"{base}/resblocks_11/x") == "s3/mrf fwd"
        assert m.classify_per_dec(
            f"jit(train_step)/transpose(jvp(SynthesizerTrn))/dec/resblocks_11/x"
        ) == "s3/mrf bwd"
        assert m.classify_per_dec(f"{base}/conv_post/kernel") == "conv_post fwd"
        assert m.classify_per_dec(f"{base}/tanh") == "glue fwd"
        # non-decoder ops are excluded, not mislabeled
        assert m.classify_per_dec(
            "jit(train_step)/jvp(SynthesizerTrn)/flow/x") == "(non-dec)"
        assert m.classify_per_dec(
            "jit(train_step)/jvp(MultiPeriodDiscriminator)/x") == "(non-dec)"

    def test_per_disc_layers(self):
        m = _load("train_phase_profile")
        assert m.classify_per_disc(
            "jit(train_step)/jvp(MultiPeriodDiscriminator)/discriminators_3/convs_4/k"
        ) == "d3/convs_4 fwd"
        assert m.classify_per_disc(
            "jit(train_step)/transpose(jvp(MultiPeriodDiscriminator))/discriminators_0/conv_post/k"
        ) == "d0/conv_post bwd"
        assert m.classify_per_disc(
            "jit(train_step)/jvp(SynthesizerTrn)/dec/x") == "(non-D)"
