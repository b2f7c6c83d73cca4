"""Property-based tests (hypothesis) for the pure-Python kernels the
Spark stages call per Arrow batch: codec round-trips over the full
parameter space (not just the generator's sizes), the NN-resize source
mapping, and the packed-int64 winnowing selection identity.

These run driver-side with no SparkSession — the point is that the
byte-format parsing and the arithmetic identities hold for ALL valid
inputs, so the mapInPandas stages are correct for any corpus, not just
the synthetic one the oracles cover.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from content_analytics_etl_spark.multimodal import (
    RESIZE_H,
    RESIZE_W,
    decode_avi24,
    decode_bmp24,
    decode_bmp24_gray,
    decode_wav16,
    decode_wav16_samples,
    encode_avi24,
    encode_bmp24,
    encode_wav16,
    resize_bmp_nn,
)

dims = st.integers(min_value=1, max_value=24)
base = st.integers(min_value=0, max_value=255)


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, b=base)
def test_bmp_round_trip_property(w, h, b):
    data = encode_bmp24(w, h, b)
    dw, dh, mean = decode_bmp24(data)
    assert (dw, dh) == (w, h)
    exp = [(b + x + y) % 256 for y in range(h) for x in range(w)]
    assert mean == sum(exp) / len(exp)
    gw, gh, rows = decode_bmp24_gray(data)
    assert (gw, gh) == (w, h)
    assert all(rows[y][x] == (b + x + y) % 256 for y in range(h) for x in range(w))


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, b=base)
def test_resize_nn_source_mapping_property(w, h, b):
    _, _, thumb = resize_bmp_nn(encode_bmp24(w, h, b))
    for k, v in enumerate(thumb):
        x, y = k % RESIZE_W, k // RESIZE_W
        sx, sy = (x * w) // RESIZE_W, (y * h) // RESIZE_H
        assert v == (b + sx + sy) % 256


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=256
    ),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(samples, sr):
    data = encode_wav16(sr, samples)
    got_sr, got = decode_wav16_samples(data)
    assert got_sr == sr and list(got) == samples
    _, n, mean_abs = decode_wav16(data)
    assert n == len(samples)
    assert mean_abs == sum(abs(s) for s in samples) / len(samples)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=8),
    nf=st.integers(min_value=1, max_value=5),
    fps=st.integers(min_value=1, max_value=60),
    b=base,
)
def test_avi_round_trip_property(w, h, nf, fps, b):
    dw, dh, dnf, dfps, mean = decode_avi24(encode_avi24(w, h, nf, fps, b))
    assert (dw, dh, dnf, dfps) == (w, h, nf, fps)
    exp = [
        (b + x + y + 7 * t) % 256
        for t in range(nf)
        for y in range(h)
        for x in range(w)
    ]
    assert mean == sum(exp) / len(exp)


POS_BITS = 21


@settings(max_examples=100, deadline=None)
@given(
    hs=st.lists(
        st.integers(min_value=0, max_value=(1 << 31) - 1), min_size=1, max_size=12
    )
)
def test_winnow_key_packing_is_lexicographic_min(hs):
    """min(h·2²¹ + (2²¹−1−pos)) must select (min h, rightmost pos) —
    the identity doc_winnow's single window-MIN relies on."""
    pos_cap = (1 << POS_BITS) - 1
    keys = [h * (1 << POS_BITS) + (pos_cap - p) for p, h in enumerate(hs)]
    sel = min(keys)
    sel_h, sel_pos = sel >> POS_BITS, pos_cap - (sel % (1 << POS_BITS))
    min_h = min(hs)
    rightmost = max(p for p, h in enumerate(hs) if h == min_h)
    assert (sel_h, sel_pos) == (min_h, rightmost)
    assert all(k < (1 << 53) for k in keys)  # exact in doubles AND int64


@settings(max_examples=60, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from([f"t{i}" for i in range(40)]), min_size=1, max_size=300
    )
)
def test_cms_overestimates_and_is_exact_without_collisions(tokens):
    """Pure-Python mirror of token_cms_heavy_hitters' sketch: the CMS
    estimate must be >= the true count for EVERY token (structural CMS
    property), with equality whenever no other token shares all D cells."""
    import hashlib
    from collections import Counter

    from content_analytics_etl_spark.plans.text_queries import CMS_D, CMS_W

    def cell(r: int, tok: str) -> int:
        h = hashlib.md5(f"cms{r}|{tok}".encode()).hexdigest()
        return int(h[:15], 16) % CMS_W

    tf = Counter(tokens)
    sketch: dict = {}
    for tok, n in tf.items():
        for r in range(CMS_D):
            k = (r, cell(r, tok))
            sketch[k] = sketch.get(k, 0) + n
    for tok, n in tf.items():
        est = min(sketch[(r, cell(r, tok))] for r in range(CMS_D))
        assert est >= n
        solo = all(
            not any(
                other != tok and cell(r, other) == cell(r, tok)
                for other in tf
            )
            for r in range(CMS_D)
        )
        if solo:
            assert est == n


@settings(max_examples=60, deadline=None)
@given(n_tokens=st.integers(min_value=1, max_value=500))
def test_chunk_plan_covers_every_token_once_per_stride(n_tokens):
    """doc_chunk's plan arithmetic: ceil(n/stride) chunks starting at
    k*stride with length min(size, n-start) cover every token index, and
    the overlap between consecutive chunks is exactly size-stride except
    at the tail."""
    from content_analytics_etl_spark.plans.text_queries import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    n_chunks = -(-n_tokens // CHUNK_STRIDE)
    covered = set()
    for c in range(n_chunks):
        start = c * CHUNK_STRIDE
        length = min(CHUNK_SIZE, n_tokens - start)
        assert length >= 1  # every planned chunk is non-empty
        covered.update(range(start, start + length))
    assert covered == set(range(n_tokens))


@given(
    data=st.binary(min_size=0, max_size=4000),
    min_code=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(data, min_code):
    """LZW encode→decode is the identity for arbitrary byte strings and
    every GIF minimum code size (values are masked into the alphabet so
    2-bit codes are exercised too)."""
    from content_analytics_etl_spark.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    alphabet_mask = (1 << min_code) - 1
    payload = bytes(b & alphabet_mask for b in data)
    assert (
        _lzw_decode_gif(_lzw_encode_gif(payload, min_code), min_code)
        == payload
    )


# --- round-8b arithmetic identities -----------------------------------------
# The engine-side constructions (both Spark and the DuckDB oracle) use
# these exact integer/window recipes; the properties pin them for ALL
# inputs, not just the synthetic corpus.


@settings(max_examples=60, deadline=None)
@given(
    ws=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80),
    k=st.integers(min_value=1, max_value=50),
)
def test_systematic_pps_midpoint_property(ws, k):
    """Madow midpoint picks: every pick lands in exactly one document's
    half-open interval, exactly k picks total, and each doc's
    multiplicity is within 1 of its expectation k*w/T (the classical
    systematic-PPS bound)."""
    total = sum(ws)
    if total == 0:
        return
    points = [((2 * i + 1) * total) // (2 * k) for i in range(k)]
    cum, picks = 0, [0] * len(ws)
    for p in points:
        assert 0 <= p < total
    for j, w in enumerate(ws):
        picks[j] = sum(1 for p in points if cum <= p < cum + w)
        cum += w
    assert sum(picks) == k
    for j, w in enumerate(ws):
        exp = k * w / total
        assert exp - 1 < picks[j] < exp + 1 or abs(picks[j] - exp) <= 1


@settings(max_examples=60, deadline=None)
@given(
    starts=st.lists(
        st.integers(min_value=0, max_value=400), min_size=0, max_size=60
    ),
    span=st.integers(min_value=1, max_value=64),
)
def test_island_merge_equals_interval_union_property(starts, span):
    """The running-max gaps-and-islands recipe (is_new = start >
    max(prev ends), island = cumsum, covered = sum(max_end - min_start))
    computes exactly the measure and count of the interval union — for
    ANY window set, including duplicates and containments."""
    ss = sorted(set(starts))
    # reference: brute-force union of [s, s+span)
    covered_pts = set()
    for s in ss:
        covered_pts.update(range(s, s + span))
    # the engine recipe
    islands, cur_s, cur_e, covered = 0, None, None, 0
    prev_max_end = None
    for s in ss:
        if prev_max_end is None or s > prev_max_end:
            if cur_e is not None:
                covered += cur_e - cur_s
            islands += 1
            cur_s, cur_e = s, s + span
        else:
            cur_e = max(cur_e, s + span)
        prev_max_end = max(prev_max_end or -1, s + span)
    if cur_e is not None:
        covered += cur_e - cur_s
    assert covered == len(covered_pts)
    # island count equals the number of maximal runs in the union
    runs = 0
    prev_in = False
    for p in range(0, 500 + span):
        now = p in covered_pts
        if now and not prev_in:
            runs += 1
        prev_in = now
    assert islands == runs
