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

The sweep ALSO executes every oracle (round-bearing or not) and flags
any result cell holding IEEE **-0.0** — the sign-of-zero emission
class that kept q_bigram_entropy red r6–r8: DuckDB preserves the
negated zero through `/` and `round(x, d)` while Spark's
BigDecimal-based Round normalizes it, so the two are numerically
equal (every row-diff passes) but hash-differ. A -0.0 here is always
a defect to REWRITE (negate per-term inside an integer quantize so
the sum is a sign-free integer — q_bigram_entropy's fix), never to
whitelist: TIE_SAFE does not exempt it. Verified this class's
mechanics in DuckDB 1.x: `-CAST(0 AS DOUBLE)`, `-0.0/n` and
`round(-0.0, 6)` all keep the sign; `CAST(round(-0.0) AS BIGINT)`
kills it.

Sign/NaN emission classes audited (r9) beyond this automated sweep:
  * negated float folds → only q_bigram_entropy had the shape; now
    integer-term (sign dies at the per-term HUGEINT cast);
  * corr/regr_* on zero-variance groups (NULL vs NaN cross-engine):
    q_regr/q_stats_agg group by high-cardinality keys over TPC-H
    columns with real variance; no zero-variance group exists at any
    shipped SF, and the NaN==NaN canon sentinel would pass a matching
    NaN pair anyway — the residual risk is an engine emitting NULL
    where the other emits NaN, which the row compare catches as an
    ordinary mismatch;
  * round(E, d) of a genuinely tiny-negative REAL (|E| below the
    half-grid): DuckDB keeps the sign (-0.0), Spark's Round
    normalizes. This sweep caught q_centroids and q_semantic_dedup
    at sf0.001 (a near-zero centroid mean / an orthogonal member's
    cosine). Standing fix — the `+ 0.0` post-round normalization on
    BOTH engine formulations (exact identity except on -0.0,
    judge-verified to normalize DuckDB) — applied r9 to every
    signed-at-round emission: cosine sims and probe/keeper dists
    (q_cosine_topk, q_ann_ivf/_lsh/_multiprobe, q_ann_recall, q_knn,
    q_band_stats lo/hi, q_semantic_dedup, q_assign_purity,
    q_centroids), signed e12 means (meanOfE12: q_unigram_lm,
    q_moore_lewis), near-zero-capable scalars (q_token_entropy
    entropy, q_kl_divergence, q_regr slope/icept/r/cov,
    q_len_quality corr_len, q_mom_growth, q_stats_agg avg_bal).
    Where the rounded value also feeds an ORDER BY / argmin
    (ANN sims, keeper dists), the normalization sits at the
    DEFINITION so ranking and emission agree: DuckDB's radix sort
    orders -0.0 before +0.0, which could otherwise flip a
    tie-break that Spark resolves by the integer key;
  * float divisions with a possibly-exactly-zero numerator:
    q_moore_lewis is integer-term (a zero LLR sum is integer 0,
    cast +0.0 both engines); q_kl_divergence is a plain float sum
    (KL ≥ 0 mathematically, can dip tiny-negative in float) —
    normalized per the previous class.

Usage: python3 tools/tiecheck.py <sfDir> <oracleSqlJson> [query ...]
       python3 tools/tiecheck.py --ledger-only <oracleSqlJson>
  <oracleSqlJson> is Verify's outDir/oracle_sql.json (or any file in
  the same {"name": "sql"} shape). --ledger-only audits the TIE_SAFE
  ledger against the oracle text without running DuckDB (no duckdb
  install needed) — it is the build-time gate that a whitelisted
  query still uses the mechanism its safety argument claims.
Exit 0 = no hazards; 1 = at least one flagged query / stale ledger.
Dev-only tool; never shipped with the library.
"""
import sys, json, re

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EPS = 1e-9

# Queries whose near-boundary round sites are PROVEN engine-stable.
# A FLAG on a listed query reports as "flag(tie-safe)" and does not
# fail the sweep. Every entry must carry the safety argument PLUS a
# verifiable profile — `mech`, a regex the oracle SQL must still
# match (the mechanism marker: integer-quantize cast, list_sort,
# the lattice expression), and `rsites`, the expected number of
# round(E, d) digit-sites in the oracle text — so a rewrite cannot
# silently inherit a stale safety argument: if the mechanism marker
# disappears or the round-site count changes, the entry FAILS (both
# in the DuckDB sweep and in the duckdb-free --ledger-only audit
# that TieHunterSpec runs on every build). A new query that flags
# without an entry FAILS — rewrite it (integer-term quantization /
# integer space) or prove it and list it.
#
# Admitted argument classes:
#  * integer-term: each per-term double is quantized ONCE to an
#    integer grid (round(term·1e12) AS HUGEINT — round-to-int of the
#    same double agrees across engines, proven r7 on score_e6) and
#    summed in exact wide-integer arithmetic (decimal(38,0) on the
#    Spark side): order-free by construction;
#    the residual risk window is one ln ulp (~1e-16) at the per-term
#    quantize, ~1e-10 per row of boundary mass.
#  * sorted-fold: the rounded value is a value-sorted sequential
#    fold, bit-identical on both engines (same term multiset, same
#    order, IEEE-deterministic ops); same residual window. No current
#    entry — q_bigram_entropy, the last holdout, moved to
#    integer-term in r9 (the sorted fold was tie-safe but emitted
#    IEEE -0.0 for all-unique-bigram docs via its final negation).
#  * lattice: per-row single-expression rational arithmetic whose
#    values live on a coarse lattice — any value is either exactly
#    ON a .5 tie (both engines round half away from zero: verified
#    DuckDB round(312.5)=313, Spark BigDecimal HALF_UP) or at least
#    ~1/(2·10^d·n_max) away, orders of magnitude beyond double noise.
INT_TERM = r"\* 1e12\)\s*AS HUGEINT"
TIE_SAFE = {
    "q_bigram_entropy": dict(
        why="integer-term (H decomposed as (Σ ctot·ln ctot − "
            "Σ cnt·ln cnt)/N: two NONNEGATIVE pico-nat families, "
            "exact integer difference; an all-unique-bigram doc — the "
            "r6–r8 red row — sums integer 0 on both sides, and the "
            "final round carries the +0.0 sign normalization)",
        mech=INT_TERM, rsites=1),
    "q_token_entropy": dict(
        why="integer-term (c·ln c in pico-nats); ttr is lattice "
            "(n_types/n_toks, n_toks ≤ doc length)",
        mech=INT_TERM, rsites=2),
    "q_unigram_lm": dict(
        why="integer-term (per-token log-probs in pico-nats)",
        mech=INT_TERM, rsites=1),
    "q_moore_lewis": dict(
        why="integer-term (per-token LLR in pico-nats)",
        mech=INT_TERM, rsites=1),
    # q_quality_score's lattice entry was RETIRED in r16: the sf1
    # tiecheck sweep flagged q_shard_manifest (the rank consumer of
    # the same lattice) — ttr/stop_ratio k/n divisions DO land
    # exactly on .00005 (odd/160 = …xxxx5 precisely), and a rank
    # turns any cross-engine disagreement into row movement. The
    # whole family (q_quality_score, q_curriculum, q_shard_manifest,
    # q_len_quality) moved to the integer-e4 lattice
    # (Text.qualityLattice): round-to-int quantize + exact integer
    # half-up — zero 2-arg round sites left to profile.
    # k/n-division lattice: a single-division output k/n has scaled
    # boundary distance |k·10^d·2 − n(2m+1)|/(2n) ≥ 1/(2n) unless the
    # tie is exact; with n ≤ ~10^6 group sizes that is ≥ 5e-7 scaled,
    # 3+ orders above the ~1e-10 round-implementation slack. Exact
    # ties only arise binary-exact (k/2^a groups, e.g. 58/64), where
    # x·10^d is an exact product and both engines round half away
    # from zero identically.
    "q_bounce_rate": dict(
        why="k/n lattice (bounces/sessions per group; exact ties "
            "like 58/64 are binary-exact, engines agree)",
        # the exact k/n division the lattice argument covers: integer
        # bounce count over integer session count, one rounded ratio
        mech=r"round\(sum\(CASE WHEN n_events = 1 THEN 1 ELSE 0 "
             r"END\) / count\(\*\), 4\)", rsites=1),
    "q_doc_stats": dict(
        why="integer-avg lattice (sum(int)/n with exact double "
            "integer sums; n=2^a groups tie binary-exactly, engines "
            "agree)",
        # both rounded cells must stay integer-avgs — avg over
        # n_chars and over integer token counts (len of the split)
        mech=r"(?s)round\(avg\(n_chars\), 4\).*round\(avg\(len\(",
        rsites=2),
    "q_rank_dist": dict(
        why="k/n lattice (percent_rank/cume_dist over n ≤ ~10^4 per "
            "segment: scaled distance ≥ 1/(2n) ≈ 8e-5, no exact ties "
            "possible for odd n−1)",
        # the two rank functions ARE the lattice — k/(n−1) and k/n
        # over the per-segment window; any other expression under the
        # round sites voids the argument
        mech=r"(?s)round\(percent_rank\(\) OVER w, 6\).*"
             r"round\(cume_dist\(\) OVER w, 6\)", rsites=2),
    "q_tfidf": dict(
        why="foldless: tf·ln(N/df) is per-row single-expression "
            "(measured nearest scaled distance 3e-4 at sf0.1; "
            "cross-engine slack is one ln ulp ≈ 1e-9 scaled)",
        # the exact per-row expression the measurement covers
        mech=r"tf \* ln\(CAST\(n_docs AS DOUBLE\) / df\)", rsites=1),
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


class _FloatSentinel:
    """Canon marker for float cells Python `==` mishandles. A class
    instance, NOT a string: a genuine VARCHAR cell holding the text
    "-0.0" or "NaN" must neither false-flag the emission sweep nor be
    silently rewritten to a float by unsigned()."""
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
    """Bit-faithful on floats, mirroring tools/check.py: -0.0 maps to
    the NEGZERO sentinel (distinct from +0.0 — the driver's value hash
    sees the sign even though Python `==` doesn't), NaN of any payload
    to NAN."""
    import math
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return NAN
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return NEGZERO
        return v
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
    # repr key: rows can mix float cells with None and the NAN/NEGZERO
    # _FloatSentinel objects across rows, which Python's default tuple
    # ordering cannot compare — repr gives a total order regardless
    return sorted(rows, key=repr)


def negzero_rows(rows):
    """Indices of canonicalized rows containing a -0.0 cell at any
    nesting depth (lists/structs included — canon flattens them to
    tuples)."""
    def has(v):
        if v is NEGZERO:
            return True
        if isinstance(v, tuple):
            return any(has(x) for x in v)
        return False
    return [i for i, r in enumerate(rows) if has(r)]


def unsigned(rows):
    """Rows with the -0.0 sentinel folded back to +0.0, re-sorted —
    for the base-vs-perturbed compare ONLY. An exact 0.0 crossing to
    -0.0 under the artificial -1e-9 nudge is the perturbation passing
    zero, not a value near a .5 tie; the emission scan (negzero_rows
    on the UNperturbed base) is where a real signed zero flags."""
    def un(v):
        if v is NEGZERO:
            return 0.0
        if isinstance(v, tuple):
            return tuple(un(x) for x in v)
        return v
    return sorted((un(r) for r in rows), key=repr)


def digit_round_sites(sql):
    """Count round(E, d) sites with an explicit digit arg — the
    perturbed hazard class; the profile recorded per TIE_SAFE entry."""
    return sum(1 for s in find_sites(sql)
               if s[3] == "round" and split_top_comma(sql[s[1]:s[2]])[1])


def audit_ledger(oracle):
    """Check every TIE_SAFE entry against the oracle text: the
    mechanism marker must still match and the digit-round-site count
    must equal the recorded profile. Returns a list of error lines —
    this needs no DuckDB, so it runs as a plain build-time test."""
    errs = []
    for name, ent in sorted(TIE_SAFE.items()):
        sql = oracle.get(name)
        if sql is None:
            errs.append(f"LEDGER {name}: listed in TIE_SAFE but not in "
                        "the oracle registry")
            continue
        if ent["mech"] and not re.search(ent["mech"], sql):
            errs.append(f"LEDGER {name}: oracle no longer matches the "
                        f"claimed mechanism /{ent['mech']}/ — the "
                        "safety argument is stale; rewrite or relist")
        n = digit_round_sites(sql)
        if n != ent["rsites"]:
            errs.append(f"LEDGER {name}: {n} round(E, d) sites, ledger "
                        f"records {ent['rsites']} — a round site was "
                        "added/removed without updating the profile")
    return errs


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    if sys.argv[1] == "--ledger-only":
        errs = audit_ledger(json.load(open(sys.argv[2])))
        for e in errs:
            print(e)
        print(f"== ledger: {len(TIE_SAFE)} entries, {len(errs)} stale ==")
        sys.exit(1 if errs else 0)
    import duckdb
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # directory-style parquet = ScaleUp synthetic corpora (r16);
        # driver testdata stays single-file
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(oracle_path))
    n_ok = n_flag = n_skip = 0
    for e in audit_ledger(oracle):
        print(e)
        n_flag += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # every oracle runs once for the sign-of-zero emission scan,
        # round-bearing or not — the class L60 proved (r6–r8) needs no
        # round site to arise, only a negated float reaching a column
        try:
            base = rows_of(con.execute(sql).df())
        except Exception as e:
            print(f"FLAG {name}: oracle failed to run: {e}")
            n_flag += 1
            continue
        nz = negzero_rows(base)
        if nz:
            print(f"FLAG {name}: oracle emits IEEE -0.0 in {len(nz)} "
                  f"row(s) — Spark normalizes the sign, the driver's "
                  f"hash does not; rewrite (per-term integer quantize) "
                  f"rather than whitelist; first: {base[nz[0]]}")
            n_flag += 1
            continue
        if not re.search(r"\bround\s*\(", sql, re.IGNORECASE):
            n_skip += 1
            continue
        try:
            up = rows_of(con.execute(perturb(sql, EPS)).df())
            dn = rows_of(con.execute(perturb(sql, -EPS)).df())
        except Exception as e:
            print(f"FLAG {name}: variant failed to run: {e}")
            n_flag += 1
            continue
        if unsigned(base) == unsigned(up) == unsigned(dn):
            print(f"OK   {name}")
            n_ok += 1
        elif name in TIE_SAFE:
            print(f"OK   {name} (flag, tie-safe: {TIE_SAFE[name]['why']})")
            n_ok += 1
        else:
            bu, uu, du = unsigned(base), unsigned(up), unsigned(dn)
            diffs = [(a, b) for a, b in zip(bu, uu) if a != b] + \
                    [(a, b) for a, b in zip(bu, du) if a != b]
            print(f"FLAG {name}: output moves under ±{EPS} perturbation "
                  f"at round sites ({len(diffs)} row diffs); first:")
            for a, b in diffs[:2]:
                print(f"  base:      {a}\n  perturbed: {b}")
            n_flag += 1
    print(f"== {n_ok} ok, {n_flag} flagged, {n_skip} no-round-skip ==")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
