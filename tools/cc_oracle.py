#!/usr/bin/env python3
"""Scalable oracle for the SimHash connected-components query family
(q_cluster_sizes, q_dedup_clusters, q_dup_spans, q_keep_canonical).

WHY: those four oracles share a recursive-CTE transitive closure
(`walk`) whose size is Σ|component|² — reachability PAIRS, not
labels. On the ScaleUp synthetic sf1 corpus the biggest component is
~31k docs (the sf0.1 near-dup cluster × 10 clones, all merged), i.e.
~10⁹ walk rows: DuckDB grinds for hours. The ENGINE side is fine
(pointer-jumping CC is O(E·log d)); it is the oracle that doesn't
scale.

WHAT: this tool computes the SAME labels with an exact union-find:
  1. signatures exactly as the SQL prefix does (distinct tokens per
     doc, sha256 hex, 63 ±1 positions, majority bit, bit-packed);
  2. identical-signature docs are provably one component (hamming 0
     passes every band and threshold), so union-find runs over
     DISTINCT signatures — the closure never materializes;
  3. inter-signature edges = share a 16-bit band at the same band
     index AND hamming ≤ 3 — the SQL `cand`/`pairs` rule verbatim;
  4. labels = docs of components with ≥2 docs, cluster_id = min
     doc_id in the component — exactly `min(lbl) … GROUP BY v`.
It then substitutes the labels table for the recursive prefix in each
oracle SQL (the query-specific SUFFIX runs unchanged in DuckDB) and
compares against the Spark parquet with check.py's canon/compare.

Equivalence is validated by running this tool at the shipped SFs,
where the original recursive oracle is also computable and already
green — same PASS there ⇒ same labels ⇒ trustworthy at sf1.

Usage: python3 tools/cc_oracle.py <sfDir> <verifyOutDir>
Dev-only tool; never shipped with the library (the library is Scala).
"""
import hashlib
import json
import os
import re
import sys
from collections import defaultdict

import duckdb

from check import rows_of

CC_QUERIES = ["q_cluster_sizes", "q_dedup_clusters", "q_dup_spans",
              "q_keep_canonical"]


def signatures(con, docs_src):
    """(doc_id -> simhash) exactly as the SQL t..sig CTE chain."""
    rows = con.execute(
        f"SELECT DISTINCT doc_id, unnest(string_split_regex("
        f"trim(lower(text)), ' +')) AS tok FROM {docs_src} "
        f"WHERE text IS NOT NULL").fetchall()
    tokvec = {}
    def vec(tok):
        v = tokvec.get(tok)
        if v is None:
            h = hashlib.sha256(tok.encode("utf-8")).hexdigest()
            # SQL: strpos('0123456789abcdef', substr(h, i, 1)) - 1 >= 8
            v = tuple(1 if int(h[i], 16) >= 8 else -1 for i in range(63))
            tokvec[tok] = v
        return v
    acc = defaultdict(lambda: [0] * 63)
    for doc_id, tok in rows:
        a = acc[doc_id]
        for p, s in enumerate(vec(tok)):
            a[p] += s
    sig = {}
    for doc_id, a in acc.items():
        s = 0
        for p in range(63):
            if a[p] > 0:
                s |= 1 << p
        sig[doc_id] = s
    return sig


def labels_of(sig):
    """(doc_id -> cluster_id) for docs with >=1 edge, via union-find
    over distinct signatures."""
    bysig = defaultdict(list)
    for d, s in sig.items():
        bysig[s].append(d)
    sigs = sorted(bysig)
    idx = {s: i for i, s in enumerate(sigs)}
    parent = list(range(len(sigs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    buckets = defaultdict(list)
    for s in sigs:
        for bp in range(4):
            buckets[(bp, (s >> (bp * 16)) & 0xFFFF)].append(s)
    for (_bp, _bv), members in buckets.items():
        n = len(members)
        for i in range(n):
            si = members[i]
            for j in range(i + 1, n):
                sj = members[j]
                if (si ^ sj).bit_count() <= 3:
                    union(idx[si], idx[sj])

    comp_docs = defaultdict(list)
    for s in sigs:
        comp_docs[find(idx[s])].extend(bysig[s])
    labels = {}
    for docs in comp_docs.values():
        if len(docs) >= 2:  # walk contains only edge-bearing vertices
            root = min(docs)
            for d in docs:
                labels[d] = root
    return labels


def rewrite(sql, labels_path):
    """Swap the recursive closure prefix for the labels parquet; the
    query-specific suffix is untouched."""
    lab_sel = f"SELECT doc_id, cluster_id FROM read_parquet('{labels_path}')"
    # named-CTE form: <name> AS (SELECT v AS doc_id, min(lbl) ... )
    m = re.search(
        r"WITH RECURSIVE.*?(\w+) AS \(SELECT v AS doc_id, min\(lbl\) AS "
        r"cluster_id\s+FROM walk GROUP BY v\)", sql, re.S)
    if m:
        return sql[:m.start()] + f"WITH {m.group(1)} AS ({lab_sel})" + \
            sql[m.end():]
    # top-level form (q_dedup_clusters): SELECT v AS doc_id, min(lbl)...
    m = re.search(
        r"WITH RECURSIVE.*?SELECT v AS doc_id, min\(lbl\) AS cluster_id\s+"
        r"FROM walk GROUP BY v", sql, re.S)
    if m:
        return sql[:m.start()] + lab_sel + sql[m.end():]
    raise ValueError("no recursive closure found in SQL")


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or set(CC_QUERIES)
    con = duckdb.connect()
    docs = f"{sfdir}/documents.parquet"
    docs_src = f"'{docs}/*.parquet'" if os.path.isdir(docs) else f"'{docs}'"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    sig = signatures(con, docs_src)
    labels = labels_of(sig)
    print(f"[cc] {len(sig)} docs, {len(labels)} labeled, "
          f"{len(set(labels.values()))} clusters")
    labels_path = "/tmp/cc_labels.parquet"
    con.execute("CREATE TABLE lab_tmp (doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO lab_tmp VALUES (?, ?)",
                    sorted(labels.items()))
    con.execute(f"COPY lab_tmp TO '{labels_path}' (FORMAT PARQUET)")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in CC_QUERIES:
        if name not in only:
            continue
        odf = con.execute(rewrite(oracle[name], labels_path)).df()
        import glob as g
        parts = sorted(g.glob(f"{outdir}/{name}/*.parquet"))
        sdf = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{p}'" for p in parts) + "])").df()
        ocols, orows = rows_of(odf)
        scols, srows = rows_of(sdf)
        if ocols != scols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
        elif len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} (spark) vs {len(orows)}")
            n_fail += 1
        elif orows != srows:
            bad = [i for i, (s, o) in enumerate(zip(srows, orows)) if s != o]
            print(f"FAIL {name}: {len(bad)} rows differ; first: "
                  f"row {bad[0]}\n  spark:  {srows[bad[0]]}\n"
                  f"  oracle: {orows[bad[0]]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
