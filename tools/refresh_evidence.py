"""Refresh fingerprint-demoted evidence entries after a LOCAL oracle gate.

The ledger in ``plans/queries.py`` keys driver evidence by (name, oracle
fingerprint, implementation fingerprint), so an engine-module edit demotes
every query that transitively imports it — even when the edit provably did
not change results. Left alone, a batch of such demotions eats the next
driver round's ~50-query budget re-proving rows the local gate already
covers, starving the genuinely-stale cohort (ADVICE r11: 9 entries went
stale the moment the true-Jaccard WHERE rewrite landed; late-r11 review
edits to shared modules demoted 38).

This tool closes that loop SAFELY: for each named query it re-runs the
exact local replica of the driver's DuckDB gate (``tools/oracle_check.py``
— row count + sorted columns + canonical value hash at the given sf_dir)
and, ONLY for names that pass, rewrites their ``_VERIFIED_ORACLE_FP`` /
``_VERIFIED_IMPL_FP`` entries to the current fingerprints. A name that
fails (or has no oracle) is left demoted — it stays at the front of the
driver's age-ordered sample, which is the correct place for it.

The refreshed entry still attests a real driver green (the name's history
round is untouched); the fingerprint update records that the local gate
verified the rewrite is result-identical. Usage:

    python tools/refresh_evidence.py [sf_dir] name [name ...]
    python tools/refresh_evidence.py --demoted [sf_dir]   # all fp-demoted
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

QUERIES_PATH = "/root/repo/hadoop_word_score_spark/plans/queries.py"


def demoted_names() -> list[str]:
    """Names with driver history whose evidence is fingerprint-demoted.

    Excludes never-run names (no history to refresh) and manual
    ``_IMPL_DEMOTED`` listings (those demotions are intentional and only a
    real driver round clears them)."""
    from hadoop_word_score_spark.plans import queries as q

    out = []
    for name in q.REGISTRY:
        if name in q._IMPL_DEMOTED:
            continue
        if q._history_round(name) == 0:
            continue
        if q._latest_evidence_round(name) == 0:
            out.append(name)
    return sorted(out)


def gate(sf_dir: str, names: list[str]) -> list[str]:
    """Run the local oracle replica; return the names that PASS."""
    import duckdb
    from oracle_check import TABLE_NAMES, value_hash

    import __spark_entry__ as entrymod
    from hadoop_word_score_spark.session import get_spark

    spark = get_spark("refresh-evidence")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    passed = []
    for name in names:
        if name not in qs or name not in oracles:
            print(f"skip  {name}: not in queries()/oracle_sql()")
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001 — a gate, report and move on
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and value_hash(scols, srows) == value_hash(ocols, orows)
        )
        print(f"{'PASS' if ok else 'FAIL'}  {name}")
        if ok:
            passed.append(name)
    return passed


def rewrite(names: list[str]) -> int:
    """Point the passed names' FP entries at the current fingerprints."""
    from hadoop_word_score_spark.plans import queries as q

    src = open(QUERIES_PATH, encoding="utf-8").read()
    n = 0
    for name in names:
        spec = q.REGISTRY[name]
        for dict_name, fp in (
            ("_VERIFIED_ORACLE_FP", q._oracle_fp(spec.oracle)),
            ("_VERIFIED_IMPL_FP", q._impl_fp(spec.fn)),
        ):
            block_at = src.index(f"{dict_name}: dict[str, str] = {{")
            block_end = src.index("\n}", block_at)  # bound the search to
            # THIS dict: a name missing here must not silently rewrite its
            # entry in the next fingerprint block
            pat = re.compile(rf'(^    "{re.escape(name)}": ")[0-9a-f]+(",)$',
                             re.M)
            m = pat.search(src, block_at, block_end)
            if m is None:
                raise SystemExit(f"no {dict_name} entry for {name!r}")
            src = src[: m.start()] + f'{m.group(1)}{fp}{m.group(2)}' + src[m.end():]
            n += 1
    open(QUERIES_PATH, "w", encoding="utf-8").write(src)
    return n


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--demoted":
        sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
        names = demoted_names()
    else:
        sf_dir, names = argv[0], argv[1:]
    if not names:
        print("nothing to refresh")
        return 0
    print(f"gating {len(names)} names at {sf_dir}")
    passed = gate(sf_dir, names)
    n = rewrite(passed)
    print(f"refreshed {n} fingerprint entries for {len(passed)} names")
    # sanity: re-import fresh and confirm promotion
    import importlib

    from hadoop_word_score_spark.plans import queries as q

    importlib.reload(q)
    still = [x for x in passed if q._latest_evidence_round(x) == 0]
    if still:
        raise SystemExit(f"still demoted after refresh: {still}")
    print("all refreshed names now rank at their history round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
