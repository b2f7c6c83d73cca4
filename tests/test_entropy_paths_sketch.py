"""Invariant tests for doc_char_entropy, events_top_paths, and
events_distinct_sketch_rollup — each pinned against an independent
pure-Python recomputation (collections.Counter entropy, per-user path
assembly, a from-scratch LogLog register table), not just the oracle.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from content_analytics_etl_spark.plans.events_queries import (
    LOGLOG_ALPHA,
    PATH_LEN,
    RHO_CAP,
    SKETCH_M,
    TOP_PATHS,
    events_distinct_sketch_rollup,
    events_top_paths,
)
from content_analytics_etl_spark.plans.text_queries import doc_char_entropy

SF = "/root/testdata/sf0.001"


def _snap_log2(x: float) -> float:
    return round(math.log2(x), 9)


def test_char_entropy_matches_counter(spark):
    docs = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower()).strip()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {r["doc_id"]: r for r in doc_char_entropy(spark, SF).collect()}
    assert set(got) == set(docs)
    for doc_id, nt in docs.items():
        c = Counter(nt)
        n = sum(c.values())
        r = got[doc_id]
        assert r["n_chars_norm"] == n
        assert r["n_distinct_chars"] == len(c)
        # mirror the engine's fixed-point reduction (PERF 29): each
        # double term quantized by floor(x*1e9 + 0.5), summed exactly
        bits = (
            sum(
                math.floor(cnt * _snap_log2(cnt) * 1e9 + 0.5)
                for cnt in c.values()
            )
            / 1e9
        )
        want = _snap_log2(n) - bits / n
        assert math.isclose(r["entropy_bits"], want, rel_tol=1e-9)
        assert 0.0 <= r["entropy_bits"] <= math.log2(len(c)) + 1e-9


def test_top_paths_matches_python_assembly(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    paths = Counter(
        ">".join(t for _, _, t in sorted(seq)[:PATH_LEN])
        for seq in by_user.values()
    )
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_PATHS]
    want = {p: (n, i + 1) for i, (p, n) in enumerate(ranked)}
    got = {
        r["path"]: (r["n_users"], r["rank"])
        for r in events_top_paths(spark, SF).collect()
    }
    assert got == want and got


def _h60(user_id: int) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:15], 16)


def _rho(h: int) -> int:
    rest = h >> 6
    if rest == 0:
        return RHO_CAP
    return ((rest & -rest) - 1).bit_count() + 1


def test_sketch_rollup_matches_python_loglog(spark):
    """The per-day register tables and the max-merged all-days row both
    match a from-scratch LogLog; the total row NEVER rescans events —
    its registers must equal the elementwise max of the daily ones."""
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("ts", "user_id")
        .collect()
    )
    day_regs: dict = defaultdict(lambda: [0] * SKETCH_M)
    exact: dict = defaultdict(set)
    for r in ev:
        day = r["ts"].date()
        h = _h60(r["user_id"])
        reg = h & (SKETCH_M - 1)
        day_regs[day][reg] = max(day_regs[day][reg], _rho(h))
        exact[day].add(r["user_id"])

    def est(regs: list[int]) -> float:
        return round(
            LOGLOG_ALPHA * SKETCH_M * 2.0 ** (sum(regs) / SKETCH_M), 6
        )

    merged = [
        max(day_regs[d][j] for d in day_regs) for j in range(SKETCH_M)
    ]
    want = {
        d: (est(day_regs[d]), len(exact[d])) for d in day_regs
    }
    want[None] = (est(merged), len(set().union(*exact.values())))

    got = {}
    for r in events_distinct_sketch_rollup(spark, SF).collect():
        key = r["day"].date() if r["day"] is not None else None
        got[key] = (r["est_users"], r["exact_users"])
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], k
        assert math.isclose(got[k][0], want[k][0], rel_tol=1e-9), k


def test_attribution_matches_python(spark):
    """Each purchase credits the latest same-user view/click at-or-
    before it iff within 7 days; otherwise 'direct' with null details."""
    from content_analytics_etl_spark.plans.temporal_queries import (
        ATTRIB_DAYS,
        events_attribution,
    )
    from datetime import timedelta

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    touches = defaultdict(list)
    purchases = []
    for r in ev:
        if r["event_type"] in ("view", "click"):
            touches[r["user_id"]].append(
                (r["ts"], r["event_id"], r["event_type"])
            )
        elif r["event_type"] == "purchase":
            purchases.append(r)
    for u in touches:
        touches[u].sort()
    want = {}
    for p in purchases:
        cand = [x for x in touches.get(p["user_id"], []) if x[0] <= p["ts"]]
        if cand and cand[-1][0] >= p["ts"] - timedelta(days=ATTRIB_DAYS):
            ts_, id_, ty_ = cand[-1]
            d = p["ts"] - ts_
            micros = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            want[p["event_id"]] = (ty_, ts_, id_, micros)
        else:
            want[p["event_id"]] = ("direct", None, None, None)
    got = {
        r["purchase_id"]: (
            r["attributed_to"], r["touch_ts"], r["touch_id"],
            r["micros_since_touch"],
        )
        for r in events_attribution(spark, SF).collect()
    }
    assert got == want and got
    assert any(v[0] == "direct" for v in want.values()) or len(want) > 0


def test_active_streaks_match_python(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        events_active_streaks,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(r["ts"].date())
    want = {}
    for u, ds in days.items():
        sd = sorted(ds)
        streaks = [1]
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        want[u] = (len(sd), len(streaks), max(streaks), sd[-1])
    got = {
        r["user_id"]: (
            r["n_active_days"], r["n_streaks"], r["longest_streak"],
            r["last_active_day"].date(),
        )
        for r in events_active_streaks(spark, SF).collect()
    }
    assert got == want and got
    assert any(v[2] > 1 for v in want.values()), "fixture has a real streak"


def test_ema_smoothing_matches_python_fold(spark):
    """The 24-point trailing EMA equals a pure-Python recursive fold
    over the same per-type hourly series (same seed, same order)."""
    from content_analytics_etl_spark.plans.analytics_queries import (
        EMA_ALPHA,
        EMA_WINDOW,
        events_ema_smoothing,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    hourly = Counter()
    for r in ev:
        hourly[(r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))] += 1
    series = defaultdict(list)
    for (ty, h), n in sorted(hourly.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[ty].append((h, n))
    want = {}
    for ty, pts in series.items():
        for i, (h, n) in enumerate(pts):
            frame = [x for _, x in pts[max(0, i - EMA_WINDOW + 1) : i + 1]]
            acc = float(frame[0])
            for x in frame[1:]:
                acc = EMA_ALPHA * x + (1 - EMA_ALPHA) * acc
            want[(ty, h)] = (n, acc)
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["ema"])
        for r in events_ema_smoothing(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1], k  # bit-exact, same fold


def test_rake_matches_python(spark):
    """Top-3 phrases per doc equal a from-scratch Python RAKE (same
    stopword runs, deg/freq scores, fixed-point phrase sums, same tie
    order)."""
    from content_analytics_etl_spark.plans.text_queries import (
        RAKE_TOP,
        STOPWORDS,
        doc_rake_keywords,
    )

    docs = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    want = {}
    for doc_id, toks in docs.items():
        phrases = []
        cur = []
        for tk in toks:
            if tk in STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(tk)
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq = Counter()
        deg = Counter()
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
        scored = {}
        occ = Counter()
        for p in phrases:
            s = sum(
                math.floor((deg[w] / freq[w]) * 1e9 + 0.5) for w in p
            ) / 1e9
            key = " ".join(p)
            occ[key] += 1
            scored[key] = (s, len(p))
        top = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))[
            :RAKE_TOP
        ]
        for rank, (phrase, (s, nw)) in enumerate(top, 1):
            want[(doc_id, rank)] = (phrase, occ[phrase], nw, s)
    got = {
        (r["doc_id"], r["rank"]): (
            r["phrase"], r["n_occurrences"], r["n_words"], r["rake_score"]
        )
        for r in doc_rake_keywords(spark, SF).collect()
    }
    assert got == want and got


def test_seasonal_naive_matches_python(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        SEASON_LAG_HOURS,
        events_seasonal_naive_eval,
    )
    from datetime import timedelta

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    hourly = Counter()
    for r in ev:
        hourly[
            (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        ] += 1
    errs = defaultdict(list)
    for (ty, h), n in hourly.items():
        prev = hourly.get((ty, h - timedelta(hours=SEASON_LAG_HOURS)))
        if prev is not None:
            errs[ty].append(n - prev)
    got = {
        r["event_type"]: (r["n_hours"], r["mae"], r["rmse"], r["bias"])
        for r in events_seasonal_naive_eval(spark, SF).collect()
    }
    assert set(got) == set(errs)
    for ty, es in errs.items():
        n = len(es)
        assert got[ty][0] == n
        assert math.isclose(got[ty][1], sum(abs(e) for e in es) / n)
        assert math.isclose(
            got[ty][2], math.sqrt(sum(e * e for e in es) / n)
        )
        assert math.isclose(got[ty][3], sum(es) / n, abs_tol=1e-12)


def test_abc_classification_matches_python(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        ABC_A_SHARE,
        ABC_B_SHARE,
        part_revenue_abc,
    )
    from decimal import Decimal

    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    rev = defaultdict(Decimal)
    nl = Counter()
    for r in li:
        rev[r["l_partkey"]] += (
            Decimal(str(r["l_extendedprice"]))
            * (1 - Decimal(str(r["l_discount"])))
        ).quantize(Decimal("0.000001"))
        nl[r["l_partkey"]] += 1
    parts = sorted(rev, key=lambda p: (-float(rev[p]), p))
    tot = sum(int(rev[p] * 1_000_000) for p in parts)
    cum = 0
    want = {}
    for rank, p in enumerate(parts, 1):
        cum += int(rev[p] * 1_000_000)
        share = cum / tot
        cls = "A" if share <= ABC_A_SHARE else ("B" if share <= ABC_B_SHARE else "C")
        want[p] = (float(rev[p]), nl[p], rank, share, cls)
    got = {
        r["l_partkey"]: (
            r["revenue"], r["n_lines"], r["rank"], r["cum_share"], r["abc_class"]
        )
        for r in part_revenue_abc(spark, SF).collect()
    }
    assert set(got) == set(want)
    n_cls = Counter(v[4] for v in got.values())
    assert n_cls["A"] and n_cls["B"] and n_cls["C"]  # all classes non-empty
    for p, (r_, n_, rk_, sh_, c_) in want.items():
        g = got[p]
        assert math.isclose(g[0], r_, rel_tol=1e-9)
        assert (g[1], g[2], g[4]) == (n_, rk_, c_)
        assert math.isclose(g[3], sh_, rel_tol=1e-12)


def test_training_manifest_matches_python(spark):
    """Per-(source, split) cells equal a pure-Python recomputation of
    split buckets, tokenization, greedy packing and shares."""
    from content_analytics_etl_spark.plans.curation_queries import (
        corpus_training_manifest,
    )
    from content_analytics_etl_spark.plans.text_queries import (
        PACK_CONTEXT,
        SPLIT_TRAIN_LT,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cells = defaultdict(list)  # (source, split) -> [(doc_id, n_tokens)]
    for r in docs:
        b = int(hashlib.md5(f"split|{r['doc_id']}".encode()).hexdigest()[:15], 16) % 100
        split = (
            "train" if b < SPLIT_TRAIN_LT
            else ("val" if b < SPLIT_TRAIN_LT + 2 else "test")
        )
        n = len(re.sub(r"\s+", " ", r["text"].lower()).strip().split(" "))
        cells[(r["source"], split)].append((r["doc_id"], n))
    want = {}
    split_tok = Counter()
    for key, rows in cells.items():
        rows.sort()
        cum = 0
        bins = set()
        for _, n in rows:
            bins.add(int(cum // PACK_CONTEXT))
            cum += n
        want[key] = (len(rows), cum, max(bins) + 1)
        split_tok[key[1]] += cum
    got = {
        (r["source"], r["split"]): (
            r["n_docs"], r["n_tokens"], r["n_sequences"],
            r["fill_ratio"], r["split_token_share"],
        )
        for r in corpus_training_manifest(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (nd, nt, ns) in want.items():
        g = got[key]
        assert (g[0], g[1], g[2]) == (nd, nt, ns)
        assert math.isclose(g[3], nt / (ns * PACK_CONTEXT), rel_tol=1e-12)
        assert math.isclose(g[4], nt / split_tok[key[1]], rel_tol=1e-12)
    for split in ("train", "val", "test"):
        s = sum(v[4] for k, v in got.items() if k[1] == split)
        assert math.isclose(s, 1.0, rel_tol=1e-9)


def test_peak_detection_matches_python(spark):
    from content_analytics_etl_spark.plans.analytics_queries import (
        events_peak_detection,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    hourly = Counter()
    for r in ev:
        hourly[
            (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        ] += 1
    series = defaultdict(list)
    for (ty, h), n in sorted(hourly.items()):
        series[ty].append((h, n))
    want = {}
    for ty, pts in series.items():
        for i in range(1, len(pts) - 1):
            if pts[i][1] > pts[i - 1][1] and pts[i][1] > pts[i + 1][1]:
                want[(ty, pts[i][0])] = (
                    pts[i][1],
                    pts[i][1] - max(pts[i - 1][1], pts[i + 1][1]),
                )
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["prominence"])
        for r in events_peak_detection(spark, SF).collect()
    }
    assert got == want and got


def test_dup_aware_sampling_unit_mass_per_family(spark):
    """Every document appears exactly once, weights are 1/cluster_size,
    and each family's weights sum to exactly one unit."""
    from content_analytics_etl_spark.plans.dedup_queries import (
        doc_dup_aware_sampling,
        dedup_clusters,
    )

    rows = doc_dup_aware_sampling(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    fam = defaultdict(list)
    for r in rows:
        assert math.isclose(r["sample_weight"], 1.0 / r["cluster_size"])
        fam[r["cluster_id"]].append(r)
    for cid, members in fam.items():
        assert len(members) == members[0]["cluster_size"]
        assert math.isclose(
            sum(m["sample_weight"] for m in members), 1.0, rel_tol=1e-12
        )
    clustered = {r["doc_id"] for r in dedup_clusters(spark, SF).collect()}
    assert any(len(m) > 1 for m in fam.values())  # real families exist
    for cid, members in fam.items():
        if len(members) == 1 and members[0]["doc_id"] not in clustered:
            assert cid == members[0]["doc_id"]  # singleton id convention


def test_multitouch_attribution_matches_python(spark):
    """Per-type totals equal a pure-Python linear attribution over the
    same 7-day inclusive window with the same fixed-point 1/k credit,
    and the total credit across types equals (purchases with >=1 touch)
    up to the declared fixed-point granularity."""
    from content_analytics_etl_spark.plans.temporal_queries import (
        ATTRIB_WINDOW_US,
        events_multitouch_attribution,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    touches = defaultdict(list)
    purchases = []
    for r in ev:
        d = r["ts"]
        us = (
            (d - d.__class__(1970, 1, 1)).days * 86_400_000_000
            + (d - d.__class__(1970, 1, 1)).seconds * 1_000_000
            + (d - d.__class__(1970, 1, 1)).microseconds
        )
        if r["event_type"] in ("view", "click"):
            touches[r["user_id"]].append((us, r["event_type"]))
        elif r["event_type"] == "purchase":
            purchases.append((r["user_id"], us, r["event_id"]))
    stats = defaultdict(lambda: [0, set(), 0])  # touches, purchases, credit_fp
    for u, pus, pid in purchases:
        hits = [
            ty
            for tus, ty in touches.get(u, [])
            if 0 <= pus - tus <= ATTRIB_WINDOW_US
        ]
        if not hits:
            continue
        fp = math.floor(1e9 / len(hits))
        for ty in hits:
            s = stats[ty]
            s[0] += 1
            s[1].add(pid)
            s[2] += fp
    got = {
        r["touch_type"]: (
            r["n_touches"], r["n_purchases_influenced"], r["total_credit"]
        )
        for r in events_multitouch_attribution(spark, SF).collect()
    }
    assert set(got) == set(stats)
    for ty, (nt, pids, fp) in stats.items():
        assert got[ty][0] == nt
        assert got[ty][1] == len(pids)
        assert math.isclose(got[ty][2], fp / 1e9, rel_tol=1e-12)


def test_open_backlog_matches_python_interval_count(spark):
    """The running census equals a direct interval count at every delta
    day, and the final cumulative sum returns to zero (every opened
    order eventually closes)."""
    from datetime import timedelta

    from content_analytics_etl_spark.plans.analytics_queries import (
        orders_open_backlog,
    )

    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    last_ship = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        k = r["l_orderkey"]
        if k not in last_ship or r["l_shipdate"] > last_ship[k]:
            last_ship[k] = r["l_shipdate"]
    spans = [
        (od, max(last_ship.get(k, od), od) + timedelta(days=1))
        for k, od in orders.items()
    ]
    rows = sorted(
        orders_open_backlog(spark, SF).collect(), key=lambda r: r["day"]
    )
    assert rows
    for r in rows:
        open_now = sum(1 for s, e in spans if s <= r["day"] < e)
        assert r["n_open_orders"] == open_now, r["day"]
    assert rows[-1]["n_open_orders"] == 0
    assert sum(r["delta"] for r in rows) == 0


def test_pmi_cooccurrence_matches_python(spark):
    """Top-50 PMI pairs equal a from-scratch Python computation over the
    same +-3 window, counts, exact pair total, and 9 dp-snapped log2."""
    from content_analytics_etl_spark.plans.text_queries import (
        PMI_MIN_COOC,
        PMI_TOP,
        PMI_WINDOW,
        token_pmi_cooccurrence,
    )

    docs = [
        re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    uni = Counter()
    pairs = Counter()
    tp = 0
    for toks in docs:
        n = len(toks)
        uni.update(toks)
        tp += sum(max(n - k, 0) for k in range(1, PMI_WINDOW + 1))
        for i, a in enumerate(toks):
            for k in range(1, PMI_WINDOW + 1):
                if i + k < n:
                    pairs[(a, toks[i + k])] += 1
    scored = [
        (
            round(math.log2((c * tp) / (uni[a] * uni[b])), 9),
            a,
            b,
            c,
        )
        for (a, b), c in pairs.items()
        if c >= PMI_MIN_COOC
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = {
        (a, b): (c, p, i + 1)
        for i, (p, a, b, c) in enumerate(scored[:PMI_TOP])
    }
    got = {
        (r["token_a"], r["token_b"]): (r["n_cooc"], r["pmi"], r["rank"])
        for r in token_pmi_cooccurrence(spark, SF).collect()
    }
    assert got == want and got


def test_sketch_set_ops_matches_python(spark):
    """Per event-type-pair union/intersection algebra: register
    max-merge + inclusion-exclusion must match a from-scratch LogLog,
    and the exact columns must match real set arithmetic."""
    from content_analytics_etl_spark.plans.events_queries import (
        events_sketch_set_ops,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "user_id")
        .collect()
    )
    regs: dict = defaultdict(lambda: [0] * SKETCH_M)
    users: dict = defaultdict(set)
    for r in ev:
        h = _h60(r["user_id"])
        reg = h & (SKETCH_M - 1)
        regs[r["event_type"]][reg] = max(regs[r["event_type"]][reg], _rho(h))
        users[r["event_type"]].add(r["user_id"])

    def est(rg: list[int]) -> float:
        return round(
            LOGLOG_ALPHA * SKETCH_M * 2.0 ** (sum(rg) / SKETCH_M), 6
        )

    types = sorted(regs)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            merged = [max(x, y) for x, y in zip(regs[a], regs[b])]
            want[(a, b)] = (
                est(regs[a]),
                est(regs[b]),
                est(merged),
                est(regs[a]) + est(regs[b]) - est(merged),
                len(users[a] & users[b]),
                len(users[a] | users[b]),
            )
    got = {
        (r["et_a"], r["et_b"]): (
            r["est_a"],
            r["est_b"],
            r["est_union"],
            r["est_intersection"],
            r["exact_intersection"],
            r["exact_union"],
        )
        for r in events_sketch_set_ops(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for gi, wi in zip(got[k], want[k]):
            if isinstance(wi, float):
                assert math.isclose(gi, wi, rel_tol=1e-9), (k, gi, wi)
            else:
                assert gi == wi, (k, gi, wi)
