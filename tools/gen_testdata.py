"""Generate synthetic testdata at scale factors the driver does not ship.

The driver provides read-only parquet at sf0.001/0.01/0.1; VERDICT r3 #3
asks for a one-off sf1 run so per-query scaling exponents become
measurements instead of plan-shape arguments.  This generator reproduces
the driver tables' schemas and value distributions (profiled from
/root/testdata/sf0.1 — schemas, category frequencies, date ranges,
lines-per-order, vocab, embedding cluster geometry) at an arbitrary sf.

It is NOT a byte-for-byte re-implementation of the driver's seed-42
generator: correctness stays gated on the driver's own sf0.01 data; this
output is used only for relative timing.

DELIBERATE divergence since round 10 (VERDICT r9 #1): documents.text
uses a Zipf ~50k-token vocabulary (see ``_zipf_vocab``) instead of the
driver's 31-word toy vocab, which made trigram space fixed and distorted
every posting-list scaling exponent.  Exponents must therefore be
computed between two scratch scales from THIS generator (sf0.1 vs sf1 vs
sf3), never scratch-vs-driver.

Usage: python tools/gen_testdata.py SF OUTDIR   (e.g. 1 /root/repo/.scratch/sf1)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# The 31 anchor words shared with the driver corpus (marker/stopword
# vocabularies in the text queries reference these, so they stay the
# TOP Zipf ranks — naturally frequent, like real stopwords).
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
# Realistic-vocabulary mode (VERDICT r9 #1): documents.text draws from a
# Zipf-distributed ~50k-token vocabulary instead of the driver's 31-word
# toy vocab.  The toy vocab made trigram space FIXED, so posting lists
# grew linearly with rows and shared-pair counts quadratically — it both
# manufactured round-9's two quadratics and flattered/distorted every
# posting-list-shaped scaling exponent.  Zipf s ≈ 1.07 (natural-text
# range); the 31 anchors occupy ranks 1-31 so marker-based queries stay
# non-degenerate; tail words are deterministic CV-syllable pseudo-words.
ZIPF_VOCAB_SIZE = 50_000
ZIPF_S = 1.07


def _zipf_vocab(rng: "np.random.Generator", size: int) -> "np.ndarray":
    """size unique lowercase words: the 31 anchors first, then seeded
    1-4-syllable consonant-vowel pseudo-words (collisions re-drawn)."""
    cons = np.array(list("bcdfghjklmnprstvz"))
    vow = np.array(list("aeiou"))
    words = list(VOCAB)
    seen = set(words)
    while len(words) < size:
        k = size - len(words)
        nsyl = rng.integers(2, 5, k)  # 2-4 syllables, 4-8 chars
        total = int(nsyl.sum())
        syl = np.char.add(
            cons[rng.integers(0, len(cons), total)],
            vow[rng.integers(0, len(vow), total)],
        )
        offs = np.concatenate([[0], np.cumsum(nsyl)])
        for i in range(k):
            w = "".join(syl[offs[i]:offs[i + 1]])
            if w not in seen:
                seen.add(w)
                words.append(w)
    return np.array(words)
PART_ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
PART_NOUN = ["ring", "bolt", "screw", "cap", "plate", "gear", "rod", "pin"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "en", "de", "fr", "es", "zh"]  # en at ~2x the rest


def _write(out: Path, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), out / f"{name}.parquet", compression="snappy")
    print(f"  {name}: {len(next(iter(cols.values())))} rows")


def _ts_us(days_float: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us")
    return pa.array(base + (days_float * 86_400_000_000).astype("timedelta64[us]"))


def generate(sf: float, out: Path) -> None:
    rng = np.random.default_rng(777)
    out.mkdir(parents=True, exist_ok=True)

    _write(out, "region", {
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS,
    })
    _write(out, "nation", {
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    })

    n_cust = int(150_000 * sf)
    _write(out, "customer", {
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    })

    n_supp = int(10_000 * sf)
    _write(out, "supplier", {
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    })

    n_part = int(200_000 * sf)
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    _write(out, "part", {
        "p_partkey": np.arange(n_part),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    })

    n_ord = int(1_500_000 * sf)
    _write(out, "orders", {
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 400_000, n_ord), 2),
        "o_orderdate": _ts_us(rng.integers(0, 2404, n_ord).astype(np.float64), "1995-01-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    })

    # lineitem: 1-7 lines per order (avg ~4), shipdate = orderdate + 1..95d
    nlines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord), nlines)
    n_li = okey.size
    linenum = (np.arange(n_li) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1)
    odate_days = rng.integers(0, 2404, n_ord).astype(np.float64)
    _write(out, "lineitem", {
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(linenum.astype(np.int32)),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(np.repeat(odate_days, nlines) + rng.integers(1, 96, n_li), "1995-01-01"),
    })

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    _write(out, "events", {
        "event_id": np.arange(n_ev),
        "ts": _ts_us(rng.uniform(0, 30, n_ev), "2024-01-01"),
        "user_id": rng.integers(0, max(n_users, 1), n_ev),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(np.abs(rng.normal(35, 45, n_ev)), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    })

    n_doc = int(50_000 * sf)
    vocab = _zipf_vocab(np.random.default_rng(20260815), ZIPF_VOCAB_SIZE)
    ranks = np.arange(1, ZIPF_VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** -ZIPF_S
    p /= p.sum()
    lens = rng.integers(10, 101, n_doc)
    flat = vocab[rng.choice(ZIPF_VOCAB_SIZE, int(lens.sum()), p=p)]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    # ~0.2% exact duplicates, mirroring the driver corpus's dup rate
    n_dup = max(2, n_doc // 500)
    dup_dst = rng.choice(n_doc, n_dup, replace=False)
    dup_src = rng.choice(n_doc, n_dup)
    for d, s in zip(dup_dst, dup_src):
        texts[d] = texts[s]
    # ~0.5% of docs belong to exact-duplicate CLUSTERS (size 4-6): real
    # crawl corpora repeat boilerplate docs many times, and the LSH
    # near-dup graph needs ≥3-cliques for the wedge-based
    # link-prediction queries to stay non-vacuous (the
    # check_correctness MIN_ROWS floor).
    n_clusters = max(2, n_doc // 1000)
    pool = rng.choice(n_doc, n_clusters * 7, replace=False)
    pi = 0
    for _ in range(n_clusters):
        size = int(rng.integers(4, 7))
        members = pool[pi:pi + size]
        pi += size
        for m in members[1:]:
            texts[m] = texts[members[0]]
    # ~0.2% NEAR-duplicates: a source doc with ~10% of tokens resampled
    # — the Jaccard gray zone that minhash band tuning exists for.
    # Destinations are drawn from docs NOT already mutated above
    # (ADVICE r10: overwriting a just-built cluster member shrinks the
    # size-4-6 cliques the wedge-based queries' MIN_ROWS floor needs).
    n_near = max(2, n_doc // 500)
    mutated = np.union1d(pool, dup_dst)
    near_dst = rng.choice(
        np.setdiff1d(np.arange(n_doc), mutated), n_near, replace=False
    )
    near_src = rng.choice(n_doc, n_near)
    for d, s in zip(near_dst, near_src):
        toks = texts[s].split(" ")
        for j in rng.choice(len(toks), max(1, len(toks) // 10), replace=False):
            toks[j] = vocab[rng.choice(ZIPF_VOCAB_SIZE, p=p)]
        texts[d] = " ".join(toks)
    _write(out, "documents", {
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    n_emb = int(20_000 * sf)
    dim, k = 64, 10
    centers = rng.normal(0, 0.016, (k, dim))  # centroid norm ~0.06 per driver data
    labels = rng.integers(0, k, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.125, (n_emb, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", {
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(vecs.astype(np.float32)), type=pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    })


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(f"/root/repo/.scratch/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}")
    generate(sf, out)
    print(f"wrote sf={sf} to {out}")
