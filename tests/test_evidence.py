"""The driver-evidence scheduler: oldest/weakest evidence first.

The driver checks ~50 registry entries per round in queries() iteration
order, so the ordering IS the re-verification policy. These tests pin its
two load-bearing properties: (a) the order is a permutation — scheduling
never adds or drops a query; (b) evidence is keyed to the oracle text, so
rewriting an oracle demotes the query to the never-verified tier (the r4
postmortem: re-oracled queries rode stale green rows and were skipped).
"""

from __future__ import annotations

from hadoop_word_score_spark.plans import queries as Q


def test_order_is_a_permutation_of_the_registry():
    ordered = list(Q.queries())
    assert sorted(ordered) == sorted(Q.REGISTRY)
    oracles = Q.oracle_sql()
    assert set(oracles) == {n for n, s in Q.REGISTRY.items() if s.oracle is not None}


def test_evidence_rounds_monotone_in_order():
    rounds = [Q._latest_evidence_round(n) for n in Q.queries()]
    assert rounds == sorted(rounds)


def test_oracle_rewrite_resets_evidence(monkeypatch):
    # pick any query with driver evidence and a recorded fingerprint
    name = next(
        n for n in Q._DRIVER_GREEN_R04
        if Q._VERIFIED_ORACLE_FP.get(n) == Q._oracle_fp(Q.REGISTRY[n].oracle)
    )
    assert Q._latest_evidence_round(name) >= 1
    patched = dict(Q._VERIFIED_ORACLE_FP)
    patched[name] = "stale_fp"
    monkeypatch.setattr(Q, "_VERIFIED_ORACLE_FP", patched)
    assert Q._latest_evidence_round(name) == 0
    assert list(Q.queries())[0] == name or name in list(Q.queries())[:8]


def test_fingerprint_is_whitespace_insensitive():
    assert Q._oracle_fp("SELECT  1\n  FROM t") == Q._oracle_fp("SELECT 1 FROM t")
    assert Q._oracle_fp(None) == "rows_only"
    assert Q._oracle_fp("SELECT 2 FROM t") != Q._oracle_fp("SELECT 1 FROM t")


def test_ledger_names_are_registered():
    for ledger in (
        Q._DRIVER_GREEN_R01, Q._DRIVER_GREEN_R02,
        Q._DRIVER_GREEN_R03, Q._DRIVER_GREEN_R04,
        Q._DRIVER_GREEN_R05,
    ):
        assert ledger <= set(Q.REGISTRY)
    assert set(Q._VERIFIED_ORACLE_FP) <= set(Q.REGISTRY)
    assert Q._IMPL_DEMOTED <= set(Q.REGISTRY)


def test_impl_demotion_resets_evidence(monkeypatch):
    # r5 advice: an execution-path rewrite with an unchanged oracle must not
    # ride old driver evidence — _IMPL_DEMOTED listings rank as round 0
    name = next(
        n for n in Q._DRIVER_GREEN_R05
        if Q._VERIFIED_ORACLE_FP.get(n) == Q._oracle_fp(Q.REGISTRY[n].oracle)
        and n not in Q._IMPL_DEMOTED
    )
    assert Q._latest_evidence_round(name) == 5
    monkeypatch.setattr(Q, "_IMPL_DEMOTED", frozenset({name}))
    assert Q._latest_evidence_round(name) == 0
    assert name in list(Q.queries())[:8]


def test_every_oracle_compiles_in_duckdb():
    # The driver runs oracles against DuckDB at sf0.01; a syntax error or a
    # missing-function reference would burn a round's evidence budget on an
    # err row. EXPLAIN compiles (plans) each oracle without executing it —
    # a millisecond-scale guard over all ~120 oracles.
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    failures = []
    for name, spec in Q.REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001 — report every broken oracle
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)
