#!/usr/bin/env python3
"""Rounding-tie hunter: flag oracle queries whose output sits on a
round/floor boundary that Spark and DuckDB may resolve differently.

Three real failures came from this class (q_min_cost_supplier at
sf0.1, q_est_error at sf0.001, q_bigram_entropy in the r6 driver run):
a double lands exactly (or within float noise) on a .5 tie at the
rounded digit, and the two engines' tie rules / fold orders disagree.

Method: for each oracle SQL, rewrite EVERY `round(E, d)` / `round(E)`
/ `floor(E)` site to `round((E) + eps, d)` with eps = +1e-9 and -1e-9,
run all three variants in DuckDB, and compare canonicalized results as
sorted row-multisets. Any difference means some value is within 1e-9
of a rounding boundary — a latent hash-tie hazard — and because the
perturbation flows through CTEs, the rounded-value-feeds-a-mean
variant (the r6 MAE failure) is caught too, not just final-SELECT
rounds.

Usage: python3 tools/tiecheck.py <sfDir> <oracleSqlJson> [query ...]
  <oracleSqlJson> is Verify's outDir/oracle_sql.json (or any file in
  the same {"name": "sql"} shape).
Exit 0 = no hazards; 1 = at least one flagged query.
Dev-only tool; never shipped with the library.
"""
import sys, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EPS = 1e-9

# Queries whose near-boundary round sites are PROVEN engine-stable.
# A FLAG on a listed query reports as "flag(tie-safe)" and does not
# fail the sweep. Every entry must carry the safety argument; a new
# query that flags without an entry FAILS — rewrite it (sortedSum /
# integer space) or prove it and list it.
#
# Two admitted argument classes:
#  * sorted-fold: the rounded value is a sortedSum (Corpus.scala) —
#    a value-sorted sequential fold, bit-identical on both engines
#    (same term multiset, same order, IEEE-deterministic ops); the
#    residual risk window is one ln ulp (~1e-16), ~1e-10 per row of
#    round(x, 6) boundary mass, vs ~1e-6 for a parallel fold.
#  * lattice: per-row single-expression rational arithmetic whose
#    values live on a coarse lattice — any value is either exactly
#    ON a .5 tie (both engines round half away from zero: verified
#    DuckDB round(312.5)=313, Spark BigDecimal HALF_UP) or at least
#    ~1/(2·10^d·n_max) away, orders of magnitude beyond double noise.
TIE_SAFE = {
    "q_bigram_entropy": "sorted-fold (struct-sorted per-doc terms)",
    "q_token_entropy": "sorted-fold (c·ln c terms); ttr is lattice "
                       "(n_types/n_toks, n_toks ≤ doc length)",
    "q_unigram_lm": "sorted-fold (per-token log-probs)",
    "q_moore_lewis": "sorted-fold (per-token LLR terms)",
    "q_quality_score": "lattice: ttr/stop_ratio are k/n divisions "
                       "(≥2.5e-8 off-tie unless binary-exact odd/2^k, "
                       "where both engines agree half-away); score is "
                       "0.6/0.4-weighted 4dp lattice — its 2e-5 grid "
                       "never lands on a .00005 tie",
    # k/n-division lattice: a single-division output k/n has scaled
    # boundary distance |k·10^d·2 − n(2m+1)|/(2n) ≥ 1/(2n) unless the
    # tie is exact; with n ≤ ~10^6 group sizes that is ≥ 5e-7 scaled,
    # 3+ orders above the ~1e-10 round-implementation slack. Exact
    # ties only arise binary-exact (k/2^a groups, e.g. 58/64), where
    # x·10^d is an exact product and both engines round half away
    # from zero identically.
    "q_bounce_rate": "k/n lattice (bounces/sessions per group; exact "
                     "ties like 58/64 are binary-exact, engines agree)",
    "q_doc_stats": "integer-avg lattice (sum(int)/n with exact "
                   "double integer sums; n=2^a groups tie binary-"
                   "exactly, engines agree)",
    "q_rank_dist": "k/n lattice (percent_rank/cume_dist over n ≤ "
                   "~10^4 per segment: scaled distance ≥ 1/(2n) ≈ "
                   "8e-5, no exact ties possible for odd n−1)",
    "q_tfidf": "foldless: tf·ln(N/df) is per-row single-expression "
               "(measured nearest scaled distance 3e-4 at sf0.1; "
               "cross-engine slack is one ln ulp ≈ 1e-9 scaled)",
}


def find_sites(sql):
    """Return [(start, arg_start, arg_end, fname)] for every
    round(...)/floor(...) call, innermost args spanned by balanced
    parens. arg_end is the index of the closing paren."""
    sites = []
    for m in re.finditer(r"\b(round|floor)\s*\(", sql, re.IGNORECASE):
        depth = 1
        i = m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth == 0:
            sites.append((m.start(), m.end(), i - 1, m.group(1).lower()))
    return sites


def split_top_comma(arg):
    """Split 'E, d' at the top-level comma (round's digit arg); return
    (expr, rest) where rest includes the leading comma, or (arg, '')."""
    depth = 0
    for i, ch in enumerate(arg):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            return arg[:i], arg[i:]
    return arg, ""


def perturb(sql, eps, all_sites=False):
    """Rewrite round (and with all_sites, floor/round-to-int) sites to
    perturb their value expression by eps.

    Default scope is round(E, d) with an explicit digit count — the
    judged hazard class: an order-sensitive double accumulation whose
    decimal-d rounding can flip with fold order. floor(...) and bare
    round(E) integer grids are excluded by default: they are almost
    always single-expression per-row arithmetic (quantize, histogram
    bucket, floor-scaled BIGINT gate), which IEEE 754 makes
    bit-identical across engines — the floor-scaled pattern IS the
    blessed fix for this class, so flagging it would fight the cure.

    Single right-to-left pass over one scan: edits to the right never
    shift a left site's start; an enclosing site's closing paren is
    shifted by the edit delta."""
    sites = [s for s in find_sites(sql)
             if all_sites or
             (s[3] == "round" and split_top_comma(sql[s[1]:s[2]])[1])]
    sites.sort(key=lambda s: -s[0])
    for idx in range(len(sites)):
        st, ast, aend, fn = sites[idx]
        arg = sql[ast:aend]
        expr, rest = split_top_comma(arg) if fn == "round" else (arg, "")
        new = f"{fn}(({expr}) + ({eps!r}){rest})"
        delta = len(new) - (aend + 1 - st)
        sql = sql[:st] + new + sql[aend + 1:]
        for j in range(idx + 1, len(sites)):
            s2 = sites[j]
            if s2[2] > st:  # closing paren beyond our start: encloses us
                sites[j] = (s2[0], s2[1], s2[2] + delta, s2[3])
    return sql


def canon(v):
    import math
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
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
    rows = [tuple(canon(x) for x in t)
            for t in df[cols].itertuples(index=False, name=None)]
    # repr key: rows can mix float with None/"NaN" across rows
    return sorted(rows, key=repr)


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    n_ok = n_flag = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if not re.search(r"\bround\s*\(", sql, re.IGNORECASE):
            n_skip += 1
            continue
        try:
            base = rows_of(con.execute(sql).df())
            up = rows_of(con.execute(perturb(sql, EPS)).df())
            dn = rows_of(con.execute(perturb(sql, -EPS)).df())
        except Exception as e:
            print(f"FLAG {name}: variant failed to run: {e}")
            n_flag += 1
            continue
        if base == up == dn:
            print(f"OK   {name}")
            n_ok += 1
        elif name in TIE_SAFE:
            print(f"OK   {name} (flag, tie-safe: {TIE_SAFE[name]})")
            n_ok += 1
        else:
            diffs = [(a, b) for a, b in zip(base, up) if a != b] + \
                    [(a, b) for a, b in zip(base, dn) if a != b]
            print(f"FLAG {name}: output moves under ±{EPS} perturbation "
                  f"at round sites ({len(diffs)} row diffs); first:")
            for a, b in diffs[:2]:
                print(f"  base:      {a}\n  perturbed: {b}")
            n_flag += 1
    print(f"== {n_ok} ok, {n_flag} flagged, {n_skip} no-round-skip ==")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
