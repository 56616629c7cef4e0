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
