import sys, json
import numpy as np, duckdb

sf = sys.argv[1]
V = duckdb.sql(f"select vec_id, embedding from '/root/repo/.scratch/{sf}/embeddings.parquet' order by vec_id").fetchnumpy()
emb = np.stack(V["embedding"]).astype(np.float64)
N, D = emb.shape
CAP = 3000
nrm = np.linalg.norm(emb, axis=1)
capv = emb[:CAP] / nrm[:CAP, None]
S = capv @ capv.T
iu = np.triu_indices(CAP, 1)
truth = {(int(a), int(b)) for a, b in zip(iu[0][S[iu] >= 0.45], iu[1][S[iu] >= 0.45])}
print(f"N={N} exact_cap={len(truth)}", flush=True)
n2 = (emb * emb).sum(1)

def run(p, T, p1, R, smode):
    k = max(8, min(65536, round(N / T)))
    s = round(np.sqrt(k)) if smode == "sqrtk" else round(np.sqrt(p1 * R * k))
    cents, sups = emb[:k], emb[:s]
    cn2, sn2 = n2[:k], n2[:s]
    d2vs = n2[:, None] - 2 * (emb @ sups.T) + sn2[None, :]
    psids = np.argsort(d2vs, axis=1, kind="stable")[:, :p1]
    d2cs = cn2[:, None] - 2 * (cents @ sups.T) + sn2[None, :]
    owners = np.argsort(d2cs, axis=1, kind="stable")[:, :R]
    by_sup = [[] for _ in range(s)]
    for cid in range(k):
        for sid in owners[cid]:
            by_sup[sid].append(cid)
    by_sup = [np.array(x, dtype=np.int64) for x in by_sup]
    d2vc = n2[:, None] - 2 * (emb @ cents.T) + cn2[None, :]
    cells = [[] for _ in range(k)]
    pool = 0
    for v in range(N):
        cand = np.unique(np.concatenate([by_sup[sid] for sid in psids[v]]))
        if cand.size == 0: continue
        pool += cand.size
        top = cand[np.argsort(d2vc[v, cand], kind="stable")[:p]]
        for c in top: cells[c].append(v)
    n_cand = 0; hits = set()
    for members in cells:
        m = np.array(members)
        n_cand += len(m) * (len(m) - 1) // 2
        mc = m[m < CAP]
        for i in range(len(mc)):
            for j in range(i + 1, len(mc)):
                pr = (int(mc[i]), int(mc[j]))
                if pr in truth: hits.add(pr)
    dots = s + pool / N
    print(json.dumps({"p": p, "T": T, "p1": p1, "R": R, "s": s, "k": k,
                      "cand_multiset": n_cand, "recall_cap": round(len(hits)/len(truth), 4),
                      "assign_dots_per_vec": round(dots, 1)}), flush=True)

for cfg in [(6,24,12,2,"opt"),(6,24,12,2,"sqrtk"),(8,14,12,2,"opt"),(7,18,10,2,"opt"),(6,24,8,2,"opt"),(6,24,16,2,"opt")]:
    run(*cfg)
