#!/usr/bin/env python3
"""Local self-check harness mirroring the driver's t2 gate.

Runs each oracle SQL (from Verify's oracle_sql.json) in DuckDB over the
same parquet tables, loads the Spark-written parquet result, sorts
columns by name in both, and compares cell-by-cell (exact — the driver
hashes, so "close" is not good enough).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Dev-only tool; never shipped with the library (the library is Scala).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class _FloatSentinel:
    """Canon marker for float cells Python `==` mishandles. A class
    instance, NOT a string (same object sentinel as tools/tiecheck.py —
    kept in sync): a genuine VARCHAR cell holding the text "-0.0" or
    "NaN" must not collide with a float cell after canon."""
    __slots__ = ("tag",)

    def __init__(self, tag):
        self.tag = tag

    def __repr__(self):
        return f"float<{self.tag}>"

    def __eq__(self, other):
        return isinstance(other, _FloatSentinel) and other.tag == self.tag

    def __hash__(self):
        return hash(("_FloatSentinel", self.tag))


NAN = _FloatSentinel("NaN")
NEGZERO = _FloatSentinel("-0.0")


def canon(v):
    """Canonicalize a cell for comparison.

    Floats are BIT-faithful, matching the driver's value hash: -0.0 is
    distinct from +0.0 (Python's `==` says they're equal, which made
    this gate blind to q_bigram_entropy's r6–r8 sign-of-zero red row),
    and NaN equals NaN (any payload) via the NAN sentinel. Sentinels
    are _FloatSentinel objects, not strings, so a VARCHAR cell
    spelling "NaN"/"-0.0" stays distinct (mirrors tools/tiecheck.py).
    For float64, bit equality == numeric equality everywhere else, so
    the ±0 split is the only behavioral change."""
    if v is None:
        return None
    # pandas/pyarrow NaN and NaT
    if isinstance(v, float):
        if math.isnan(v):
            return NAN
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return NEGZERO
        return v
    # timestamps -> isoformat at µs precision
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return canon(v.item())
    return v


def rows_of(df):
    cols = sorted(df.columns)
    out = []
    for t in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon(x) for x in t))
    return cols, out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the
        # ScaleUp synthetic corpora); driver testdata are single files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            n_fail += 1
            continue
        sdf = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{p}'" for p in parts) + "])").df()
        ocols, orows = rows_of(odf)
        scols, srows = rows_of(sdf)
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            n_fail += 1
            continue
        # dtype-kind parity: the driver hashes Python values, so int
        # width doesn't matter (r1: q_rank passed with int32 vs int64)
        # but int-vs-float does (r1: q_case_when failed on
        # HUGEINT->float64 vs bigint). Compare numpy dtype *kind*.
        def kind(dt):
            k = dt.kind
            return "i" if k in "iu" else k
        odt = [kind(odf[c].dtype) for c in ocols]
        sdt = [kind(sdf[c].dtype) for c in scols]
        if odt != sdt:
            print(f"FAIL {name}: dtypes differ\n  oracle: {list(zip(ocols, odt))}\n"
                  f"  spark:  {list(zip(scols, sdt))}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count {len(srows)} (spark) vs {len(orows)} (oracle)")
            n_fail += 1
            continue
        bad = [(i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first 3:")
            for i, s, o in bad[:3]:
                print(f"  row {i} cols {ocols}\n    spark:  {s}\n    oracle: {o}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
