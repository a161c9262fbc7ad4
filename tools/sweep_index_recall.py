#!/usr/bin/env python3
"""Operating-point sweep for the corpus-scaled topK ANN index family.

Replicates Similarity.ivfTopKHier under the deterministic seed quantizer
(hierarchyOfCentroids + assignWithHierarchy) in numpy and measures v17-style
recall@5 over the first 20 query ids, for candidate (nCells rule, nProbe
fraction, superProbe fraction, corpus superProbe) operating points at two
scale factors. Picks the cheapest point clearing recall >= 0.8 at both.

Pure analysis tooling — results feed the probesFor/superProbesFor constants
in Similarity.scala; the authoritative recall numbers remain the oracled
v17/v19 queries.
"""
import sys, math
import numpy as np
import duckdb


def load(sf):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '/root/testdata/sf{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def cos(A, B):
    An = A / np.linalg.norm(A, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    return An @ Bn.T


def assign_hier(X, ids, cent_ids, cent_vecs, n_super, super_probe, keep):
    """ids/X -> list of probed leaf cells per row (keep nearest leaves among
    super_probe nearest supers' leaves). cent ids sorted ascending; supers =
    first n_super in cell order; each leaf mapped to nearest super."""
    sup_ids = cent_ids[:n_super]
    sup_vecs = cent_vecs[:n_super]
    # leaf -> nearest super (tie lowest sid: argmax picks first max index)
    ls = cos(cent_vecs, sup_vecs)
    leaf_super = sup_ids[np.argmax(ls, axis=1)]
    vs = cos(X, sup_vecs)  # n x n_super
    # per row: super_probe nearest supers (desc sim, tie lowest sid)
    order = np.lexsort((sup_ids[None, :].repeat(len(X), 0), -vs), axis=1)
    probed_sup = sup_ids[order[:, :super_probe]]
    vl = cos(X, cent_vecs)  # n x nc
    out = []
    for i in range(len(X)):
        mask = np.isin(leaf_super, probed_sup[i])
        cand_cells = cent_ids[mask]
        sims = vl[i, mask]
        o = np.lexsort((cand_cells, -sims))
        out.append(cand_cells[o[:keep]])
    return out


def recall_at(sf, nc_rule, np_frac, sp_frac, corpus_sp, topk=5, nq=20):
    ids, X = load(sf)
    n = len(ids)
    nc = max(16, nc_rule(n))
    ns = math.ceil(math.sqrt(nc))
    n_probe = max(6, -(-np_frac[0] * nc // np_frac[1]))
    s_probe = max(3, -(-sp_frac[0] * ns // sp_frac[1])) if sp_frac else 3
    c_sp = ns if corpus_sp == "all" else (max(3, -(-ns // 2)) if corpus_sp == "half" else 3)
    cent_vecs = X[:nc]
    cent_ids = ids[:nc]
    corpus_cell = [c[0] for c in assign_hier(X, ids, cent_ids, cent_vecs, ns, c_sp, 1)]
    corpus_cell = np.array(corpus_cell)
    qX = X[:nq]
    probed = assign_hier(qX, ids[:nq], cent_ids, cent_vecs, ns, s_probe, n_probe)
    sims = cos(qX, X)
    recs, cands = [], []
    for qi in range(nq):
        s = sims[qi].copy()
        s[qi] = -2
        exact = set(np.argsort(-s, kind="stable")[:topk])
        mask = np.isin(corpus_cell, probed[qi])
        mask[qi] = False
        cand_idx = np.where(mask)[0]
        cands.append(len(cand_idx))
        top = cand_idx[np.argsort(-s[cand_idx], kind="stable")[:topk]]
        recs.append(len(exact & set(top)) / topk)
    return nc, n_probe, s_probe, c_sp, float(np.mean(recs)), float(np.mean(cands)) / n


def main():
    nc_sqrt = lambda n: math.ceil(4 * math.sqrt(n))
    print(f"{'sf':>6} {'npfrac':>7} {'spfrac':>7} {'csp':>5} | {'nc':>4} {'np':>4} {'sp':>3} {'c':>3} {'recall':>7} {'cover':>6}")
    for np_frac in [(1, 4), (5, 16), (3, 8), (7, 16), (1, 2)]:
        for sp_frac in [None, (1, 2), (5, 8)]:
            for csp in ["pin3", "half"]:
                line = []
                for sf in ["0.01", "0.1"]:
                    nc, npv, spv, cspv, rec, cov = recall_at(sf, nc_sqrt, np_frac, sp_frac, csp)
                    line.append((sf, nc, npv, spv, cspv, rec, cov))
                ok = all(r[5] >= 0.8 for r in line)
                for sf, nc, npv, spv, cspv, rec, cov in line:
                    print(f"{sf:>6} {str(np_frac):>7} {str(sp_frac):>7} {csp:>5} | {nc:>4} {npv:>4} {spv:>3} {cspv:>3} {rec:>7.3f} {cov:>6.3f}" + ("  <= PASS" if ok else ""))


if __name__ == "__main__":
    main()
