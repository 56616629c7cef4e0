"""StreamServer: multi-stream window-batched serving (serving.py).

The contract under test: batching N independent live streams into one
(max_streams, chunk) decode changes NOTHING about any stream's audio -- each
handle's concatenated pieces equal running that stream alone through the B=1
``stream_mel_to_wav`` path with the same (chunk, overlap, seed, sid,
noise_scale). Position-derived prior noise plus per-row knobs make
co-scheduling semantics-free; these tests pin it.

Equality granularity: co-tenancy and slot position are pinned BIT-EXACT (the
same compiled program runs regardless of batch occupancy). Batched-vs-B=1
crosses two different XLA programs; on this suite's forced-8-virtual-device
CPU runtime XLA tiles them differently, giving <=1 ULP f32 drift (~9e-8; the
same comparison is exactly 0 on a single-device CPU runtime), so those
asserts use atol=1e-6/rtol=0. scripts/bench_streaming.py re-runs the
batched-vs-sequential comparison on the real TPU and reports the measured
max |diff|.
"""

import numpy as np
import pytest

from smart_vocoder_tpu.inference import Vocoder
from smart_vocoder_tpu.serving import StreamServer
from tests.test_inference_api import tiny_vocoder

pytestmark = pytest.mark.fast

CHUNK, OVERLAP = 64, 16


def assert_matches_sequential(got, want):
    """Batched vs B=1 crosses XLA programs: exact math, <=1 ULP tiling drift
    under the test runtime (see module docstring)."""
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def _mel(seed, t, n_mels=80):
    return np.asarray(
        np.random.default_rng(seed).normal(size=(t, n_mels)), np.float32)


def _pieces(mel, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(mel[i : i + s])
        i += s
    if i < len(mel):
        out.append(mel[i:])
    return [p for p in out if len(p)]


def _sequential(voc, mel, seed, sid=None, noise_scale=0.667):
    return np.concatenate(list(voc.stream_mel_to_wav(
        _pieces(mel, [23] * 40), chunk=CHUNK, overlap=OVERLAP, seed=seed,
        sid=None if sid is None else np.asarray([sid]),
        noise_scale=noise_scale)))


@pytest.fixture(scope="module")
def voc(tmp_path_factory):
    hps, params = tiny_vocoder(tmp_path_factory.mktemp("cfg"))
    return Vocoder(hps, params, dtype=np.float32, buckets=(CHUNK,))


@pytest.fixture(scope="module")
def voc_ms(tmp_path_factory):
    hps, params = tiny_vocoder(tmp_path_factory.mktemp("cfg_ms"), ms=True)
    return Vocoder(hps, params, dtype=np.float32, buckets=(CHUNK,))


def _serve_all(server, streams):
    """streams: list of (handle, mel) -> dict handle -> concatenated audio."""
    got = {h: [] for h, _ in streams}
    feeds = {h: iter(_pieces(mel, [17] * 60)) for h, mel in streams}
    for h, wav in server.run(feeds):
        got[h].append(wav)
    return {h: np.concatenate(ws) for h, ws in got.items()}


def test_batched_matches_sequential(voc):
    """3 concurrent streams (different lengths, seeds, noise_scales) through
    one batched program == each alone through stream_mel_to_wav."""
    server = StreamServer(voc, max_streams=4, chunk=CHUNK, overlap=OVERLAP)
    specs = [  # (seed, frames, noise_scale)
        (0, 150, 0.667),
        (7, 101, 0.667),
        (3, 64, 1.0),
    ]
    streams = []
    for seed, t, ns in specs:
        h = server.open(seed=seed, noise_scale=ns)
        streams.append((h, _mel(seed + 100, t)))
    batched = _serve_all(server, streams)

    for (h, mel), (seed, t, ns) in zip(streams, specs):
        want = _sequential(voc, mel, seed, noise_scale=ns)
        assert_matches_sequential(batched[h], want)


def test_speaker_conditioned_rows(voc_ms):
    """Per-row speaker ids: each stream decodes with its own embedding."""
    server = StreamServer(voc_ms, max_streams=4, chunk=CHUNK, overlap=OVERLAP)
    mel = _mel(5, 96)
    h0 = server.open(seed=1, sid=0)
    h1 = server.open(seed=1, sid=3)
    batched = _serve_all(server, [(h0, mel), (h1, mel)])

    w0 = _sequential(voc_ms, mel, 1, sid=0)
    w1 = _sequential(voc_ms, mel, 1, sid=3)
    assert_matches_sequential(batched[h0], w0)
    assert_matches_sequential(batched[h1], w1)
    assert not np.array_equal(w0, w1)  # the sid rows actually condition


def test_oversubscription_schedules_everyone(voc):
    """6 streams on a max_streams=2 server: the scheduler round-robins by
    oldest cursor and every stream still gets bit-exact audio."""
    server = StreamServer(voc, max_streams=2, chunk=CHUNK, overlap=OVERLAP)
    streams = [(server.open(seed=s), _mel(s, 80 + 10 * s)) for s in range(6)]
    batched = _serve_all(server, streams)
    for i, (h, mel) in enumerate(streams):
        assert_matches_sequential(batched[h], _sequential(voc, mel, i))


def test_slot_position_invariance(voc):
    """A stream's audio is independent of WHICH batch row it lands in and of
    what co-occupies the batch."""
    mel = _mel(42, 120)

    s1 = StreamServer(voc, max_streams=4, chunk=CHUNK, overlap=OVERLAP)
    alone = _serve_all(s1, [(s1.open(seed=9), mel)])

    s2 = StreamServer(voc, max_streams=4, chunk=CHUNK, overlap=OVERLAP)
    # two earlier opens shift the target stream to row 2
    others = [(s2.open(seed=s), _mel(s, 100)) for s in (1, 2)]
    target = (s2.open(seed=9), mel)
    crowded = _serve_all(s2, others + [target])

    np.testing.assert_array_equal(
        list(alone.values())[0], crowded[target[0]])


def test_incremental_step_api(voc):
    """The explicit feed/step/close API: nothing emits before a full window
    is buffered; close() flushes the tail; pieces equal the offline path."""
    mel = _mel(11, 90)
    server = StreamServer(voc, max_streams=2, chunk=CHUNK, overlap=OVERLAP)
    h = server.open(seed=11)

    step = CHUNK - 2 * OVERLAP
    server.feed(h, mel[: step + OVERLAP - 1])  # one frame short of a window
    assert server.pending() == 0 and server.step() == {}

    server.feed(h, mel[step + OVERLAP - 1 :])
    pieces = []
    while server.pending():
        pieces.extend(server.step().values())
    server.close(h)
    while server.pending():
        pieces.extend(server.step().values())

    want = voc.mel_to_wav_chunked(mel, chunk=CHUNK, overlap=OVERLAP, seed=11)
    assert_matches_sequential(np.concatenate(pieces), want)
