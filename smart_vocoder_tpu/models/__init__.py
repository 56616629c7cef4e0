"""Model layer (L4): the CVAE synthesizer and the discriminator ensemble."""

from smart_vocoder_tpu.models.synthesizer import (
    Generator,
    MelEncoder,
    PosteriorEncoder,
    ResidualCouplingBlock,
    SynthesizerTrn,
    build_synthesizer,
)
from smart_vocoder_tpu.models.discriminator import (
    DiscriminatorP,
    DiscriminatorS,
    MultiPeriodDiscriminator,
)

__all__ = [
    "DiscriminatorP",
    "DiscriminatorS",
    "Generator",
    "MelEncoder",
    "MultiPeriodDiscriminator",
    "PosteriorEncoder",
    "ResidualCouplingBlock",
    "SynthesizerTrn",
    "build_synthesizer",
]
