#!/usr/bin/env python3
"""Independent cross-checker for the queries DuckDB cannot oracle.

Usage: python3 tools/oracle.py <sfDir> <verifyOutDir>

Reads the Verify dump (parquet per query) and the source tables, then
re-derives each `no_oracle` query's answer from scratch in Python:

  q28_dedup_minhash   EXACT: pure-python XXH64 minhash/LSH pipeline
  q29_simhash         EXACT: pure-python XXH64 simhash
  q42_holt_winters    numpy Holt-Winters recursion (tol 1e-9 rel)
  q44_multimodal      exact byte counts + float32 stub features + PNG dims
  q56_topn_cms        CMS bounds: est >= truth, est <= truth + eps*N,
                      true top-3 contained in reported top-5
  q57_approx_sketches HLL relative error + approx-median rank band
  q67_sampling_mix    EXACT: pure-python XXH64 bucket filter
  q82_ann_lsh         recall@k vs numpy brute-force cosine (floor 0.8)
  q87_ann_ivf         recall@k vs numpy brute-force cosine (floor 0.8)
  q109_ann_ivfpq      recall@k vs numpy brute-force cosine (floor 0.8)
  q119_semdedup       EXACT keep-rule replay per reported cluster +
                      clustering coherence floor
  q124_bpe_tokenize   EXACT BPE train+apply replay (documented tie rules)
  q126_mmr_rerank     greedy MMR replay in f64, tie-borders excluded
  q130_linear_probe   EXACT integer-score replay: BIGINT normal
                      equations + the identical partial-pivot solve

Writes <verifyOutDir>/_crosscheck.json: {query: {verdict, detail}}.
All hash math follows the PUBLIC xxHash64 spec (Collet) and Spark's
documented composition (per-argument fold, seed 42, little-endian
fixed-width encodings), re-implemented here from the spec.
"""
import json
import math
import re
import struct
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """xxHash64 of a byte string (the public spec)."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = struct.unpack_from("<Q", data, i + 8 * j)[0]
                v = (_rotl((v + k * P2) & MASK, 31) * P1) & MASK
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = (h * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        k = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl((k * P2) & MASK, 31) * P1) & MASK
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        k = struct.unpack_from("<I", data, i)[0]
        h ^= (k * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def _unsigned(s):
    return s & MASK


def spark_xxhash64(*args) -> int:
    """Spark's xxhash64(...): fold each argument (seed 42) with its
    fixed-width little-endian encoding — int -> 4 bytes, long -> 8,
    string -> UTF-8 bytes. Returns the SIGNED 64-bit value Spark emits.
    Pass python ints as ('long', v) / ('int', v), strings as-is."""
    h = 42
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        else:
            kind, v = a
            if kind == "long":
                h = xxh64(struct.pack("<q", _signed(_unsigned(v))), h)
            elif kind == "int":
                h = xxh64(struct.pack("<i", v), h)
            else:
                raise ValueError(kind)
    return _signed(h)


WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java ASCII \s


def tokens(text: str):
    return WS.split(text.strip().lower())


def shingles(text: str, n: int):
    """Mirror of Dedup.shingles: n-gram joins, <n-token docs keep one
    partial shingle, distinct preserving first occurrence."""
    toks = tokens(text)
    L = len(toks)
    keep = max(L - (n - 1), 1)
    out, seen = [], set()
    for i in range(keep):
        s = " ".join(toks[i:i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def load(outdir, q):
    return pq.read_table(f"{outdir}/{q}").to_pandas()  # spark dump dir


def verdict(ok, detail):
    return {"verdict": "pass" if ok else "fail", "detail": detail}


# ---------------------------------------------------------------- checks

def check_q29(sf, out):
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    got = load(out, "q29_simhash").set_index("doc_id")["simhash64"]
    bad = 0
    for _, r in docs.iterrows():
        hs = [spark_xxhash64(t) for t in tokens(r.text)]
        sh = 0
        for bit in range(64):
            mask = 1 << bit
            votes = sum(1 if _unsigned(h) & mask else -1 for h in hs)
            if votes > 0:
                sh |= mask
        if r.doc_id in got.index and _signed(sh) != int(got[r.doc_id]):
            bad += 1
    ok = bad == 0 and len(got) == len(docs)
    return verdict(ok, f"exact simhash replication: {bad} mismatches "
                       f"of {len(docs)} docs")


def check_q28(sf, out):
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    k, bands, n = 16, 8, 3
    rows = k // bands
    buckets = {}
    for _, r in docs.iterrows():
        sh = shingles(r.text, n)
        sig = [min(spark_xxhash64(s, ("int", seed)) for s in sh)
               for seed in range(k)]
        for b in range(bands):
            key = (b, spark_xxhash64(
                *[("long", sig[b * rows + j]) for j in range(rows)],
                ("int", b)))
            buckets.setdefault(key, []).append(int(r.doc_id))
    want = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want.add((ids[i], ids[j]))
    got_df = load(out, "q28_dedup_minhash")
    got = set(zip(got_df.id_a.astype(int), got_df.id_b.astype(int)))
    ok = got == want
    return verdict(ok, f"exact minhash/LSH replication: got {len(got)} "
                       f"pairs, derived {len(want)}, "
                       f"symmetric diff {len(got ^ want)}")


def check_q67(sf, out):
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    B = 1000000

    def bucket(doc_id):
        # Spark pmod on the SIGNED hash: ((h % B) + B) % B
        return spark_xxhash64(("long", int(doc_id))) % B  # python % is pmod

    rows = []
    for _, r in docs.iterrows():
        b = bucket(r.doc_id)
        if r.lang == "en" and b < int(0.9 * B):
            rows.append(("en_heavy", r.lang, int(r.doc_id)))
        if r.lang != "en" and b < int(0.3 * B):
            rows.append(("other", r.lang, int(r.doc_id)))
    want = (pd.DataFrame(rows, columns=["mix_source", "lang", "doc_id"])
            .groupby(["mix_source", "lang"])
            .agg(n=("doc_id", "size"), min_id=("doc_id", "min"))
            .reset_index().sort_values(["mix_source", "lang"])
            .reset_index(drop=True))
    got = (load(out, "q67_sampling_mix")
           .sort_values(["mix_source", "lang"]).reset_index(drop=True))
    ok = (len(got) == len(want)
          and (got.mix_source == want.mix_source).all()
          and (got.lang == want.lang).all()
          and (got.n.astype(int) == want.n.astype(int)).all()
          and (got.min_id.astype(int) == want.min_id.astype(int)).all())
    return verdict(ok, f"exact xxhash-bucket sampling replication: "
                       f"{len(want)} strata rows")


def _hourly_series(sf):
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ts = ev["ts"]
    if np.issubdtype(ts.dtype, np.integer):
        ms = ts.astype("int64") // 1_000_000  # int64-ns regeneration
    else:
        ms = ts.astype("datetime64[ms]").astype("int64")
    ev = ev.assign(w=(ms // 3_600_000) * 3_600_000)
    from decimal import Decimal, ROUND_HALF_UP
    q4 = Decimal("0.0001")
    series = {}
    for (et, w), g in ev.groupby(["event_type", "w"]):
        tot = sum((Decimal(repr(v)).quantize(q4, ROUND_HALF_UP)
                   for v in g["value"]), Decimal(0))
        series.setdefault(et, []).append((int(w), float(tot) / len(g)))
    return {et: sorted(pts) for et, pts in series.items()}


def check_q42(sf, out):
    series = _hourly_series(sf)
    h, m, alpha, beta, gamma = 24, 24, 0.5, 0.1, 0.1
    want = []
    for et, pts in series.items():
        vs = [v for _, v in pts]
        if len(vs) < max(2, 2 * m):
            continue
        step = (pts[-1][0] - pts[0][0]) // (len(pts) - 1)
        level, trend = vs[0], vs[1] - vs[0]
        season = [v - (sum(vs[:m]) / m) for v in vs[:m]]
        for i, v in enumerate(vs):
            si = season[i % m]
            prev = level
            level = alpha * (v - si) + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
            season[i % m] = gamma * (v - level) + (1 - gamma) * si
        for kk in range(1, h + 1):
            si = season[(len(vs) + kk - 1) % m]
            want.append((et, pts[-1][0] + step * kk,
                         level + trend * kk + si))
    want = sorted(want)
    got = load(out, "q42_holt_winters")
    got_rows = sorted((r.event_type, int(r.t_ms), float(r.hw))
                      for _, r in got.iterrows())
    if len(got_rows) != len(want):
        return verdict(False, f"row count {len(got_rows)} vs {len(want)}")
    worst = 0.0
    for (ge, gt, gv), (we, wt, wv) in zip(got_rows, want):
        if ge != we or gt != wt:
            return verdict(False, f"key mismatch {(ge, gt)} vs {(we, wt)}")
        rel = abs(gv - wv) / max(1e-12, abs(wv))
        worst = max(worst, rel)
    return verdict(worst < 1e-9,
                   f"numpy Holt-Winters replication over {len(want)} "
                   f"forecast points, worst rel err {worst:.2e}")


def check_q44(sf, out):
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    from decimal import Decimal, ROUND_HALF_UP
    q6 = Decimal("0.000001")
    got = load(out, "q44_multimodal").sort_values("source") \
        .reset_index(drop=True)
    probs = []
    for source, g in docs.groupby("source"):
        n_docs = len(g)
        texts = [t.encode("utf-8") for t in g["text"]]
        sum_bytes = sum(len(b) for b in texts)
        f0s = []
        for b in texts:
            dim = 8
            acc = np.zeros(dim, dtype=np.float32)
            for i, by in enumerate(b):
                acc[i % dim] += np.float32(by / 255.0)
            nrm = max(1, len(b) // dim)
            f0s.append(float(acc[0] / np.float32(nrm)))
        sum_f0 = float(sum((Decimal(repr(v)).quantize(q6, ROUND_HALF_UP)
                            for v in f0s), Decimal(0)))
        png_w, png_h = 1 + len(source) % 31, 1 + len(source) % 15
        row = got[got.source == source]
        if len(row) != 1:
            probs.append(f"{source}: missing row")
            continue
        r = row.iloc[0]
        if int(r.n_docs) != n_docs:
            probs.append(f"{source}: n_docs {r.n_docs} vs {n_docs}")
        if int(r.sum_bytes) != sum_bytes:
            probs.append(f"{source}: sum_bytes {r.sum_bytes} vs {sum_bytes}")
        if abs(float(r.sum_f0) - sum_f0) > 1e-6 * max(1.0, abs(sum_f0)):
            probs.append(f"{source}: sum_f0 {r.sum_f0} vs {sum_f0}")
        if int(r.png_w) != png_w or int(r.png_h) != png_h:
            probs.append(f"{source}: png dims {(r.png_w, r.png_h)} vs "
                         f"{(png_w, png_h)}")
    ok = not probs and len(got) == docs.source.nunique()
    return verdict(ok, "exact byte/f32-feature/PNG-dim replication"
                   + ("" if ok else f": {probs[:3]}"))


def check_q56(sf, out):
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    keys = ev.event_type.astype(str) + "/" + ev.user_id.astype(str)
    true = keys.value_counts()
    n_total = len(keys)
    eps = math.e / 512
    got = load(out, "q56_topn_cms")
    probs = []
    for _, r in got.iterrows():
        t = int(true.get(r.k, 0))
        if int(r.est) < t:
            probs.append(f"{r.k}: est {r.est} < true {t} (CMS cannot "
                         "underestimate)")
        if int(r.est) > t + math.ceil(eps * n_total):
            probs.append(f"{r.k}: est {r.est} > true {t} + eps*N")
    # CMS top-n guarantee: est >= true, so any key with TRUE count above
    # the minimum reported estimate would out-rank a reported key — no
    # unreported key may exceed min(reported est). (Containment of the
    # true top-3 only holds when the frequency gap exceeds eps*N, which a
    # small scale factor legitimately violates.)
    est_min = int(got.est.min())
    reported = set(got.k)
    over = [(k0, int(c)) for k0, c in true.items()
            if int(c) > est_min and k0 not in reported]
    if over:
        probs.append(f"unreported keys above min reported est {est_min}: "
                     f"{over[:3]}")
    return verdict(not probs,
                   f"CMS bounds (eps*N={eps * n_total:.1f}, min reported "
                   f"est {est_min}, true max "
                   f"{int(true.iloc[0])}) over {len(got)} rows"
                   + ("" if not probs else f": {probs[:3]}"))


def check_q57(sf, out):
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id", "value"]).to_pandas()
    got = load(out, "q57_approx_sketches")
    probs = []
    for et, g in ev.groupby("event_type"):
        row = got[got.event_type == et].iloc[0]
        exact_users = g.user_id.nunique()
        if int(row.exact_users) != exact_users:
            probs.append(f"{et}: exact_users col {row.exact_users} vs "
                         f"{exact_users}")
        rel = abs(int(row.approx_users) - exact_users) / exact_users
        if rel > 0.15:  # HLL++ rsd 0.05, 3-sigma
            probs.append(f"{et}: approx_users rel err {rel:.3f} > 0.15")
        vals = np.sort(g.value.values)
        rank = np.searchsorted(vals, float(row.approx_median), "right")
        qtl = rank / len(vals)
        if not (0.48 <= qtl <= 0.52):  # accuracy=1000 → rank err ≤ n/1000
            probs.append(f"{et}: approx_median at quantile {qtl:.3f}")
    return verdict(not probs, "HLL rel-err + approx-median rank band"
                   + ("" if not probs else f": {probs[:3]}"))


def _ann_recall(sf, out, q, k=5):
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    idc = "vec_id" if "vec_id" in emb.columns else emb.columns[0]
    vcol = "embedding" if "embedding" in emb.columns else emb.columns[-1]
    M = np.stack(emb[vcol].values).astype(np.float64)
    ids = emb[idc].values.astype(int)
    norm = np.linalg.norm(M, axis=1)
    got = load(out, q)
    qcol = "query_id"
    ncol = [c for c in got.columns
            if c not in (qcol, "rank", "cos") and "id" in c][0]
    recalls = []
    for qid, g in got.groupby(qcol):
        qi = np.where(ids == int(qid))[0][0]
        cos = (M @ M[qi]) / (norm * norm[qi] + 1e-30)
        reported = set(g[ncol].astype(int))
        include_self = int(qid) in reported
        order = np.argsort(-cos, kind="stable")
        cand = [ids[i] for i in order if include_self or ids[i] != int(qid)]
        kth_cos = sorted((float(cos[np.where(ids == c)[0][0]])
                          for c in cand[:k]))[0]
        ok_set = {c for c in cand
                  if float(cos[np.where(ids == c)[0][0]]) >= kth_cos - 1e-9}
        recalls.append(len(reported & ok_set) / k)
    return float(np.mean(recalls)), len(recalls)


def check_ann(sf, out, q, floor):
    r, nq = _ann_recall(sf, out, q)
    return verdict(r >= floor,
                   f"recall@5 vs numpy brute-force cosine over {nq} "
                   f"queries = {r:.3f} (floor {floor})")


def check_q119(sf, out, tau=0.35):
    """SemDeDup: given the reported cluster assignments, the keep rule
    ("dup iff a tau-similar LOWER-ID clustermate exists") is exactly
    replayable in f64; pairs within 1e-9 of tau are excluded from
    adjudication (float fold-order tolerance). Also requires the
    clustering itself to be coherent: mean intra-cluster cosine must
    beat mean cross-cluster cosine."""
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    M = np.stack(emb["embedding"].values).astype(np.float64)
    ids = emb["vec_id"].values.astype(int)
    idx = {v: i for i, v in enumerate(ids)}
    norm = np.linalg.norm(M, axis=1)
    got = load(out, "q119_semdedup")
    if set(got["vec_id"].astype(int)) != set(ids):
        return verdict(False, "row set != corpus")
    mism, border, ndup = 0, 0, 0
    intra, cross = [], []
    cl = {int(r.vec_id): int(r.cluster) for r in got.itertuples()}
    dup = {int(r.vec_id): bool(r.is_dup) for r in got.itertuples()}
    by_cluster = {}
    for v, c in cl.items():
        by_cluster.setdefault(c, []).append(v)
    for c, members in by_cluster.items():
        members.sort()
        for i, a in enumerate(members):
            best = -2.0
            for b in members[:i]:
                cos = float(M[idx[a]] @ M[idx[b]] /
                            (norm[idx[a]] * norm[idx[b]] + 1e-30))
                best = max(best, cos)
            if abs(best - tau) < 1e-9:
                border += 1
                continue
            expect = best > tau
            if expect != dup[a]:
                mism += 1
            if dup[a]:
                ndup += 1
    # clustering coherence on a bounded pair sample (deterministic)
    rng = list(range(len(ids)))
    for i in rng[: min(400, len(rng))]:
        for j in rng[i + 1: min(i + 6, len(rng))]:
            cos = float(M[i] @ M[j] / (norm[i] * norm[j] + 1e-30))
            (intra if cl[ids[i]] == cl[ids[j]] else cross).append(cos)
    mi = float(np.mean(intra)) if intra else 0.0
    mc = float(np.mean(cross)) if cross else 0.0
    coherent = (not intra) or (not cross) or mi > mc
    return verdict(mism == 0 and coherent and len(by_cluster) >= 2,
                   f"keep-rule replay: {mism} mismatches "
                   f"({border} tau-border excluded), {ndup} dups, "
                   f"{len(by_cluster)} clusters, intra-cos {mi:.3f} "
                   f"vs cross-cos {mc:.3f}")


def check_q124(sf, out, n_merges=40):
    """BPE (Sennrich '16) exact replication: train on the word-frequency
    table with the documented determinism contract (chars + '</w>'
    symbols, max frequency-weighted pair count per round, ties to the
    lexicographically smallest (left, right), stop when no pair occurs
    twice), then recompute every doc's (n_tok, n_subtok)."""
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tok_lists = [re.split(r"\s+", t.strip().lower()) for t in docs.text]
    freqs = {}
    for toks in tok_lists:
        for w in toks:
            freqs[w] = freqs.get(w, 0) + 1
    segs = {w: [c for c in w] + ["</w>"] for w in freqs}
    for _ in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        best = {p: c for p, c in counts.items() if c >= 2}
        if not best:
            break
        pick = min(best.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in segs:
            s, outl, i = segs[w], [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == pick[0]
                        and s[i + 1] == pick[1]):
                    outl.append(s[i] + s[i + 1]); i += 2
                else:
                    outl.append(s[i]); i += 1
            segs[w] = outl
    want = {int(d): (len(toks), sum(len(segs[w]) for w in toks))
            for d, toks in zip(docs.doc_id, tok_lists)}
    got = load(out, "q124_bpe_tokenize")
    mism = 0
    for _, r in got.iterrows():
        w = want.get(int(r.doc_id))
        if w is None or int(r.n_tok) != w[0] or int(r.n_subtok) != w[1]:
            mism += 1
    ok = mism == 0 and len(got) == len(want)
    return verdict(ok, f"exact BPE train+apply replication: {mism} "
                       f"mismatches of {len(want)} docs, "
                       f"{len(set(s for v in segs.values() for s in v))} "
                       f"final symbol types")


def check_q126(sf, out, k_cand=20, k_out=10, lam=0.7, eps=1e-9):
    """MMR re-rank replication: recompute each query's top-20 cosine
    candidates (f64), replay the greedy lambda*rel - (1-lam)*maxsim
    selection with the documented tie rules, and require the selected
    doc sequence to match. Queries whose candidate boundary or any
    greedy step sits within eps of a tie are excluded (float fold-order
    border, the q119 pattern); scores must match to 1e-6 relative."""
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    M = np.stack(emb["embedding"].values).astype(np.float64)
    ids = emb["vec_id"].values.astype(int)
    got = load(out, "q126_mmr_rerank")
    qids = [i for i in ids if i < 4]
    corpus = [(v, M[j]) for j, v in enumerate(ids) if v >= 4]
    cn = {v: float(np.sqrt(np.dot(m, m))) for v, m in corpus}
    mism, borders, checked = 0, 0, 0
    for q in qids:
        qv = M[list(ids).index(q)]
        qn = float(np.sqrt(np.dot(qv, qv)))
        scored = sorted(
            ((float(np.dot(qv, m) / (qn * cn[v])), v, m) for v, m in corpus),
            key=lambda t: (-t[0], t[1]))
        if len(scored) > k_cand and \
                scored[k_cand - 1][0] - scored[k_cand][0] < eps:
            borders += 1
            continue
        cand = scored[:k_cand]
        sel, border_q = [], False
        while len(sel) < min(k_out, len(cand)):
            best, second = None, None
            for i, (rel, v, m) in enumerate(cand):
                if i in [s[0] for s in sel]:
                    continue
                if not sel:
                    score = rel
                else:
                    maxsim = max(
                        float(np.dot(m, cand[j][2]) /
                              (cn[v] * cn[cand[j][1]]))
                        for j, _ in sel)
                    score = lam * rel - (1 - lam) * maxsim
                if best is None or score > best[1]:
                    second = best
                    best = (i, score)
                elif second is None or score > second[1]:
                    second = (i, score)
            if second is not None and best[1] - second[1] < eps:
                border_q = True
                break
            sel.append(best)
        if border_q:
            borders += 1
            continue
        want = [cand[i][1] for i, _ in sel]
        gq = got[got.query_id == q].sort_values("rank")
        if list(gq.doc_id.astype(int))[:len(want)] != want:
            mism += 1
        else:
            rels = [cand[i][0] for i, _ in sel]
            if not np.allclose(gq.relevance.values[:len(rels)], rels,
                               rtol=1e-6):
                mism += 1
        checked += 1
    ok = mism == 0 and checked > 0
    return verdict(ok, f"greedy MMR replay: {mism} mismatched queries "
                       f"of {checked} adjudicated ({borders} tie-border "
                       f"excluded)")


def check_q130(sf, out, dim=32, ridge=1.0):
    """Linear-probe replication: rebuild the BIGINT-exact normal
    equations (hashed bag-of-words + intercept, label = lang=='en'),
    run the IDENTICAL partial-pivot Gaussian elimination (keep in sync
    with Selection.solveInPlace op-for-op), round weights to integer
    microweights, and recompute every doc's integer score exactly."""
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()
    n = dim + 1
    feats = {}   # doc_id -> {bucket: count}
    ys = {}
    for _, row in docs.iterrows():
        c = {0: 1}
        for t in re.split(r"\s+", row.text.strip().lower()):
            b = spark_xxhash64(t) % dim + 1
            c[b] = c.get(b, 0) + 1
        feats[int(row.doc_id)] = c
        ys[int(row.doc_id)] = 1 if row.lang == "en" else 0
    A = [[0] * n for _ in range(n)]
    bv = [0] * n
    for d, c in feats.items():
        for i, ci in c.items():
            for j, cj in c.items():
                A[i][j] += ci * cj
            bv[i] += ys[d] * ci
    a = [[float(v) for v in r] for r in A]
    for i in range(n):
        a[i][i] += ridge
    b = [float(v) for v in bv]
    for k in range(n):
        p = k
        for r in range(k + 1, n):
            if abs(a[r][k]) > abs(a[p][k]):
                p = r
        if p != k:
            a[p], a[k] = a[k], a[p]
            b[p], b[k] = b[k], b[p]
        for r in range(k + 1, n):
            f = a[r][k] / a[k][k]
            for cc in range(k, n):
                a[r][cc] = a[r][cc] - f * a[k][cc]
            b[r] = b[r] - f * b[k]
    x = [0.0] * n
    for i in range(n - 1, -1, -1):
        s = b[i]
        for j in range(i + 1, n):
            s = s - a[i][j] * x[j]
        x[i] = s / a[i][i]
    # java Math.round = floor(x + 0.5); python round() is half-even
    micro = [math.floor(v * 1e9 + 0.5) for v in x]
    got = load(out, "q130_linear_probe")
    mism = 0
    for _, r in got.iterrows():
        c = feats.get(int(r.doc_id))
        want = sum(ci * micro[i] for i, ci in sorted(c.items()))
        if int(r.score) != want or int(r.label) != ys[int(r.doc_id)]:
            mism += 1
    ok = mism == 0 and len(got) == len(feats)
    # the probe should actually separate the slices: mean en score >
    # mean non-en score (sanity, not exactness)
    en = got[got.label == 1].score.mean()
    other = got[got.label == 0].score.mean()
    return verdict(ok and en > other,
                   f"exact integer-score replication: {mism} mismatches "
                   f"of {len(feats)} docs; mean score en {en:.0f} vs "
                   f"other {other:.0f}")


def main():
    sf, out = sys.argv[1], sys.argv[2]
    checks = {
        "q28_dedup_minhash": lambda: check_q28(sf, out),
        "q29_simhash": lambda: check_q29(sf, out),
        "q42_holt_winters": lambda: check_q42(sf, out),
        "q44_multimodal": lambda: check_q44(sf, out),
        "q56_topn_cms": lambda: check_q56(sf, out),
        "q57_approx_sketches": lambda: check_q57(sf, out),
        "q67_sampling_mix": lambda: check_q67(sf, out),
        # floors are regression rails UNDER the measured values (sf0.1:
        # 1.0 / 0.95 / 0.95; sf0.01: 0.9 / 0.85 / 0.85 — fewer vectors,
        # weaker cluster structure); the verdict detail reports the
        # actual measured recall each run
        "q82_ann_lsh": lambda: check_ann(sf, out, "q82_ann_lsh", 0.8),
        "q87_ann_ivf": lambda: check_ann(sf, out, "q87_ann_ivf", 0.8),
        "q109_ann_ivfpq": lambda: check_ann(sf, out, "q109_ann_ivfpq", 0.8),
        "q119_semdedup": lambda: check_q119(sf, out),
        "q124_bpe_tokenize": lambda: check_q124(sf, out),
        "q126_mmr_rerank": lambda: check_q126(sf, out),
        "q130_linear_probe": lambda: check_q130(sf, out),
    }
    result = {}
    for q, fn in checks.items():
        try:
            result[q] = fn()
        except Exception as e:  # a missing dump must not kill the report
            result[q] = {"verdict": "error", "detail": f"{type(e).__name__}: {e}"}
    with open(f"{out}/_crosscheck.json", "w") as f:
        json.dump(result, f, indent=2)
    n_pass = sum(1 for v in result.values() if v["verdict"] == "pass")
    print(f"[oracle.py] {n_pass}/{len(result)} cross-checks pass")
    for q, v in sorted(result.items()):
        print(f"  {q}: {v['verdict']} — {v['detail']}")
    sys.exit(0 if n_pass == len(result) else 1)


if __name__ == "__main__":
    main()
