"""Observability (L8): file logger, TensorBoard writing, spectrogram plots,
git-hash provenance (reference utils.py:59-131, :194-226).

Scalar names are kept identical to the reference (``loss/g/total``, ...) so
existing TB dashboards work unchanged (train.py:224-229).
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
from typing import Dict, Optional

import numpy as np

_MATPLOTLIB_READY = False


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    """File logger at logs/<model>/train.log (ref: utils.py:214-226)."""
    logger = logging.getLogger(os.path.basename(model_dir))
    logger.setLevel(logging.DEBUG)
    os.makedirs(model_dir, exist_ok=True)
    if not any(isinstance(h, logging.FileHandler) for h in logger.handlers):
        h = logging.FileHandler(os.path.join(model_dir, filename))
        h.setLevel(logging.DEBUG)
        h.setFormatter(logging.Formatter("%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s"))
        logger.addHandler(h)
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        logger.addHandler(logging.StreamHandler(sys.stdout))
    return logger


def make_writer(log_dir: str):
    """TensorBoard SummaryWriter (tensorboardX)."""
    from tensorboardX import SummaryWriter

    return SummaryWriter(log_dir=log_dir)


def summarize(
    writer,
    global_step: int,
    scalars: Optional[Dict] = None,
    histograms: Optional[Dict] = None,
    images: Optional[Dict] = None,
    audios: Optional[Dict] = None,
    audio_sampling_rate: int = 22050,
) -> None:
    """Mirror of the reference's summarize (utils.py:59-67)."""
    for k, v in (scalars or {}).items():
        writer.add_scalar(k, float(v), global_step)
    for k, v in (histograms or {}).items():
        writer.add_histogram(k, np.asarray(v), global_step)
    for k, v in (images or {}).items():
        writer.add_image(k, np.asarray(v), global_step, dataformats="HWC")
    for k, v in (audios or {}).items():
        wav = np.asarray(v, dtype=np.float32).reshape(-1, 1)
        try:
            writer.add_audio(k, wav, global_step, audio_sampling_rate)
        except ModuleNotFoundError:
            # tensorboardX's audio encoder needs the optional soundfile package;
            # fall back to dropping real wav files next to the event logs.
            from scipy.io import wavfile

            out_dir = os.path.join(getattr(writer, "logdir", "."), "audio")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{k.replace('/', '_')}_{global_step}.wav")
            wavfile.write(path, audio_sampling_rate,
                          (np.clip(wav[:, 0], -1, 1) * 32767).astype(np.int16))


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """Render an (n_mels, frames) array to an RGB image (ref: utils.py:78-101)."""
    global _MATPLOTLIB_READY
    import matplotlib

    if not _MATPLOTLIB_READY:
        matplotlib.use("Agg")
        logging.getLogger("matplotlib").setLevel(logging.WARNING)
        _MATPLOTLIB_READY = True
    import matplotlib.pylab as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(np.asarray(spectrogram), aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    data = data.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3]
    plt.close(fig)
    return data.copy()


def plot_alignment_to_numpy(alignment: np.ndarray, info: Optional[str] = None) -> np.ndarray:
    """Render an alignment matrix to an RGB image (ref: utils.py:104-130;
    unused by the vocoder graph but part of the observability surface)."""
    global _MATPLOTLIB_READY
    import matplotlib

    if not _MATPLOTLIB_READY:
        matplotlib.use("Agg")
        logging.getLogger("matplotlib").setLevel(logging.WARNING)
        _MATPLOTLIB_READY = True
    import matplotlib.pylab as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    plt.xlabel(xlabel)
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    data = data.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3]
    plt.close(fig)
    return data.copy()


def check_git_hash(model_dir: str, logger: Optional[logging.Logger] = None) -> None:
    """Warn when resuming a run dir created at a different git HEAD
    (ref: utils.py:194-211)."""
    log = logger or logging.getLogger(__name__)
    source_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
    if not os.path.exists(os.path.join(source_dir, ".git")):
        log.warning("%s is not a git repository; hash comparison skipped", source_dir)
        return
    cur_hash = subprocess.getoutput(f"git -C {source_dir} rev-parse HEAD")
    path = os.path.join(model_dir, "githash")
    if os.path.exists(path):
        saved_hash = open(path).read()
        if saved_hash != cur_hash:
            log.warning("git hash values are different. %s(saved) != %s(current)",
                        saved_hash[:8], cur_hash[:8])
    else:
        os.makedirs(model_dir, exist_ok=True)
        open(path, "w").write(cur_hash)
