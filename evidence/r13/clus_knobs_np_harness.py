import sys, json, itertools
import numpy as np, duckdb

sf = sys.argv[1]
V = duckdb.sql(f"select vec_id, embedding from '/root/repo/.scratch/{sf}/embeddings.parquet' order by vec_id").fetchnumpy()
ids = V["vec_id"]; emb = np.stack(V["embedding"]).astype(np.float64)
N, D = emb.shape
CAP = 3000
nrm = np.linalg.norm(emb, axis=1)
# exact truth on capped subpopulation
capv = emb[:CAP] / nrm[:CAP, None]
S = capv @ capv.T
iu = np.triu_indices(CAP, 1)
truth = set(zip(*[x[S[iu] >= 0.45] for x in iu])) if CAP <= N else None
truth = {(int(a), int(b)) for a, b in zip(iu[0][S[iu] >= 0.45], iu[1][S[iu] >= 0.45])}
print(f"N={N} exact_cap={len(truth)}", flush=True)
n2 = (emb * emb).sum(1)

def run(p, T, p1, R):
    k = max(8, min(65536, round(N / T)))
    s = round(np.sqrt(k))
    cents, sups = emb[:k], emb[:s]
    cn2, sn2 = n2[:k], n2[:s]
    # vector -> top-p1 supers
    d2vs = n2[:, None] - 2 * (emb @ sups.T) + sn2[None, :]
    psids = np.argsort(d2vs, axis=1, kind="stable")[:, :p1]
    # cell -> top-R supers
    d2cs = cn2[:, None] - 2 * (cents @ sups.T) + sn2[None, :]
    owners = np.argsort(d2cs, axis=1, kind="stable")[:, :R]
    # super -> owned cells
    by_sup = [[] for _ in range(s)]
    for cid in range(k):
        for sid in owners[cid]:
            by_sup[sid].append(cid)
    by_sup = [np.array(x, dtype=np.int64) for x in by_sup]
    d2vc = n2[:, None] - 2 * (emb @ cents.T) + cn2[None, :]
    cells = [[] for _ in range(k)]
    for v in range(N):
        cand = np.unique(np.concatenate([by_sup[sid] for sid in psids[v]])) if p1 < s or R > 1 else np.arange(k)
        if cand.size == 0: continue
        top = cand[np.argsort(d2vc[v, cand], kind="stable")[:p]]
        for c in top: cells[c].append(v)
    n_cand = 0; hits = set()
    pair_sets = []
    for members in cells:
        m = np.array(members)
        n_cand += len(m) * (len(m) - 1) // 2
        mc = m[m < CAP]
        if len(mc) > 1:
            for i in range(len(mc)):
                for j in range(i + 1, len(mc)):
                    pr = (int(mc[i]), int(mc[j]))
                    if pr in truth: hits.add(pr)
    rec = len(hits) / len(truth)
    print(json.dumps({"p": p, "T": T, "p1": p1, "R": R, "k": k, "s": s,
                      "cand_multiset": n_cand, "recall_cap": round(rec, 4)}), flush=True)

for cfg in [(5,35,5,1),(5,35,24,1),(5,35,8,2),(5,35,5,2),(6,24,8,1),(6,24,8,2),(6,24,12,2),(6,24,29,1),(7,18,8,2),(6,24,5,2),(8,14,8,2)]:
    run(*cfg)
