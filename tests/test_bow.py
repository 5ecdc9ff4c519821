"""Place-recognition index tests (reference role: OBIndex2 + iBoW-LCD)."""

import numpy as np
import pytest

from ov2slam_tpu.slam import bow


def make_descs(rng, n=150):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb(rng, d, nbits=8):
    """Flip nbits random bits per descriptor (viewpoint change noise)."""
    out = d.copy()
    for i in range(len(out)):
        for _ in range(nbits):
            b = rng.integers(0, 256)
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


@pytest.fixture(params=["native", "python"])
def index(request):
    if request.param == "native":
        idx = bow.BinaryIndex(force_python=False)
        if not idx.native:
            pytest.skip("native bow index unavailable")
        return idx
    return bow.BinaryIndex(force_python=True)


def test_index_retrieves_revisit(index, subtests=None):
    rng = np.random.default_rng(0)
    places = [make_descs(rng) for i in range(30)]
    for i, d in enumerate(places):
        index.add_image(i, d)
    # query with a noisy copy of place 7
    q = perturb(rng, places[7])
    hits = index.query(q, max_image_id=29, topk=5)
    assert hits, "no hits"
    assert hits[0][0] == 7
    # the true hit dominates
    if len(hits) > 1:
        assert hits[0][1] > 3 * hits[1][1]


def test_index_temporal_guard(index):
    rng = np.random.default_rng(1)
    places = [make_descs(rng) for i in range(10)]
    for i, d in enumerate(places):
        index.add_image(i, d)
    q = perturb(rng, places[9])
    hits = index.query(q, max_image_id=5, topk=5)
    assert all(h[0] <= 5 for h in hits)


def test_native_python_agree():
    nat = bow.BinaryIndex(force_python=False)
    if not nat.native:
        pytest.skip("native bow index unavailable")
    py = bow.BinaryIndex(force_python=True)
    rng = np.random.default_rng(2)
    places = [make_descs(rng, 80) for _ in range(15)]
    for i, d in enumerate(places):
        nat.add_image(i, d)
        py.add_image(i, d)
    q = perturb(rng, places[4], nbits=6)
    hn = nat.query(q, max_image_id=14, topk=3)
    hp = py.query(q, max_image_id=14, topk=3)
    assert hn[0][0] == hp[0][0] == 4


def test_lcdetector_full_loop():
    """Simulated trajectory revisiting its start: the detector must fire on
    the revisit with the right match and never before."""
    rng = np.random.default_rng(3)
    det = bow.LCDetector(p_wait=20, min_consecutive=2, min_score=5.0)
    n = 70
    places = [make_descs(rng, 120) for _ in range(50)]
    fired = []
    for kf in range(n):
        if kf < 50:
            d = places[kf]           # novel places
        else:
            d = perturb(rng, places[kf - 50], nbits=6)   # revisit start
        cand = det.process(kf, d)
        if cand is not None:
            fired.append((kf, cand.match_kf))
    assert fired, "loop never detected"
    first = fired[0]
    assert first[0] >= 51           # needs 2 consecutive consistent islands
    assert abs(first[1] - (first[0] - 50)) <= 2


def test_lcdetector_no_false_positive():
    rng = np.random.default_rng(4)
    det = bow.LCDetector(p_wait=10, min_consecutive=2, min_score=5.0)
    for kf in range(60):
        cand = det.process(kf, make_descs(rng, 120))
        assert cand is None
