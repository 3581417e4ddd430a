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


def _precedes_same_round_clean(name):
    # r10 scheduling contract for a demoted query: it re-enters the order
    # at its HISTORY round (not the front — the front belongs to brand-new
    # names and the genuinely oldest evidence), but wins the tie against
    # every clean name of the same history round.
    names = list(Q.queries())
    pos = {n: i for i, n in enumerate(names)}
    rnd = Q._history_round(name)
    if rnd == 0:
        # no history at all -> must be in the leading no-history block
        lead = [n for n in names if Q._history_round(n) == 0]
        return name in lead and all(
            Q._history_round(n) == 0 for n in names[: len(lead)]
        )
    clean_same_round = [
        n
        for n in names
        if n != name
        and Q._history_round(n) == rnd
        and Q._latest_evidence_round(n) == rnd
    ]
    return all(pos[name] < pos[n] for n in clean_same_round)


def test_order_is_a_permutation_of_the_registry():
    ordered = list(Q.queries())
    assert sorted(ordered) == sorted(Q.REGISTRY)
    oracles = Q.oracle_sql()
    assert set(oracles) == {n for n, s in Q.REGISTRY.items() if s.oracle is not None}


def test_history_rounds_monotone_in_order():
    # the order is round-robin by evidence AGE: ascending by the round of
    # the last driver touch, with never-touched names (history 0) leading
    rounds = [Q._history_round(n) for n in Q.queries()]
    assert rounds == sorted(rounds)


def test_demoted_names_win_ties_but_do_not_jump_rounds():
    # Fingerprint demotion zeroes the EVIDENCE claim but must not let one
    # shared-module edit starve genuinely-staler names out of the driver
    # budget (r9 verdict #1: 39 names stuck at r5 behind a demoted tier).
    names = list(Q.queries())
    pos = {n: i for i, n in enumerate(names)}
    demoted = [
        n
        for n in names
        if Q._history_round(n) > 0 and Q._latest_evidence_round(n) == 0
    ]
    stalest_clean = [
        n
        for n in names
        if Q._latest_evidence_round(n) > 0
        and Q._history_round(n)
        == min(
            (Q._history_round(m) for m in names if Q._history_round(m) > 0),
        )
    ]
    for d in demoted:
        # ties within the same history round go to the demoted name
        assert _precedes_same_round_clean(d), d
        # but a demoted recent name never outranks the oldest clean cohort
        for c in stalest_clean:
            if Q._history_round(d) > Q._history_round(c):
                assert pos[c] < pos[d], (c, d)


def test_oracle_rewrite_resets_evidence(monkeypatch):
    # pick any query with LIVE driver evidence (both oracle and impl
    # fingerprints current — matching on the oracle fp alone picked queries
    # an engine-module edit had already impl-demoted, a false red)
    name = next(
        n for n in Q._DRIVER_GREEN_R04 if Q._latest_evidence_round(n) >= 1
    )
    patched = dict(Q._VERIFIED_ORACLE_FP)
    patched[name] = "stale_fp"
    monkeypatch.setattr(Q, "_VERIFIED_ORACLE_FP", patched)
    assert Q._latest_evidence_round(name) == 0
    assert _precedes_same_round_clean(name)


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
    # ride old driver evidence — _IMPL_DEMOTED listings rank as round 0.
    # Pick a name at the CURRENT evidence floor (the rotation keeps raising
    # it — hardcoding "round 5" broke when r10 cleared the r5 cohort).
    rnd, name = min(
        (Q._latest_evidence_round(n), n)
        for n in Q.REGISTRY
        if Q._latest_evidence_round(n) > 0 and n not in Q._IMPL_DEMOTED
    )
    monkeypatch.setattr(Q, "_IMPL_DEMOTED", frozenset({name}))
    assert Q._latest_evidence_round(name) == 0
    assert _precedes_same_round_clean(name)


def test_impl_fp_rewrite_resets_evidence(monkeypatch):
    # r5 advice, structural form: driver evidence is keyed to an
    # implementation fingerprint (fn source + transitive engine modules), so
    # a code rewrite demotes the query even with an unchanged oracle.
    rnd, name = min(
        (Q._latest_evidence_round(n), n)
        for n in Q.REGISTRY
        if Q._latest_evidence_round(n) > 0 and n not in Q._IMPL_DEMOTED
    )
    patched = dict(Q._VERIFIED_IMPL_FP)
    patched[name] = "rewritten_code"
    monkeypatch.setattr(Q, "_VERIFIED_IMPL_FP", patched)
    assert Q._latest_evidence_round(name) == 0
    assert _precedes_same_round_clean(name)


def test_impl_fp_sees_transitive_module_content(tmp_path, monkeypatch):
    # The fingerprint must change when a transitively-imported engine module
    # changes content — that is the exact gap the r5 advice flagged (the
    # similarity.py rewrite was invisible to oracle-keyed evidence).
    spec = Q.REGISTRY["similarity_topk"]
    before = Q._impl_fp(spec.fn)
    import inspect

    src = inspect.getsource(spec.fn)
    mods = Q._resolve_rel_imports(src, ("plans",))
    assert "operators.similarity" in Q._engine_module_closure(tuple(sorted(mods)))
    # simulate a module edit by clearing the digest cache and patching the
    # file content hash path through a copied package root
    import hashlib as h
    import os
    import shutil

    fake_root = tmp_path / "pkg"
    shutil.copytree(Q._PKG_ROOT, fake_root)
    target = fake_root / "operators" / "similarity.py"
    target.write_text(target.read_text() + "\n# rewritten\n")
    monkeypatch.setattr(Q, "_PKG_ROOT", str(fake_root))
    monkeypatch.setattr(Q, "_modules_digest_cache", {})
    after = Q._impl_fp(spec.fn)
    assert after != before


def test_impl_fp_ignores_ledger_edits():
    # Edits to queries.py outside a fn body (the evidence ledgers this tool
    # rewrites every round) must NOT demote anything: the fp hashes the fn
    # source and imported modules, never the whole queries.py file.
    spec = Q.REGISTRY["wordscore"]
    import inspect

    src = inspect.getsource(spec.fn)
    assert "_DRIVER_GREEN" not in src
    mods = Q._engine_module_closure(
        tuple(sorted(Q._resolve_rel_imports(src, ("plans",))))
    )
    assert "plans.queries" not in mods


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


def test_closure_resolves_package_level_relative_imports():
    # r6 ADVICE (medium): `from ..functions import codecs` used to resolve
    # to a nonexistent functions.py and drop silently, leaving codecs.py
    # out of every multimodal fingerprint. The closure must now contain
    # the package __init__ AND the imported submodule.
    from hadoop_word_score_spark.plans.queries import _engine_module_closure

    closure = _engine_module_closure(("operators.multimodal",))
    assert "functions.codecs" in closure
    assert "functions.__init__" in closure


def test_unresolvable_relative_import_fails_loudly():
    import pytest

    from hadoop_word_score_spark.plans.queries import _resolve_rel_imports

    with pytest.raises(ImportError, match="cannot resolve"):
        _resolve_rel_imports("from ..nosuchpkg import thing\n", ("plans",))


def test_package_import_aliases_and_lists_resolve_submodules():
    from hadoop_word_score_spark.plans.queries import _resolve_rel_imports

    mods = _resolve_rel_imports(
        "from ..functions import codecs as _c, text\n", ("operators",)
    )
    assert {"functions.__init__", "functions.codecs", "functions.text"} <= mods


def _load_oracle_check():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools" / "oracle_check.py"
    spec = importlib.util.spec_from_file_location("oracle_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canon_is_sign_strict_on_negative_zero():
    # The driver's canonicalizer distinguishes -0.0 from +0.0 ("%.9g"-style
    # "-0" vs "0"); the local replica must reproduce that classification or
    # it masks driver-only reds (r6/r7 embedding_covariance postmortem:
    # DuckDB ROUND emits -0.0 where Spark F.round emits +0.0).
    canon = _load_oracle_check().canon
    assert canon(-0.0) != canon(0.0)
    assert canon(0.0) == "0.0"
    assert canon(-0.0) == "-0.0"
    # integral-float type-strictness is unchanged
    assert canon(2.0) == "2.0"
    assert canon(-2.0) == "-2.0"
    assert canon(float("nan")) == "NaN"


def test_canon_distinguishes_negative_zero_inside_collections():
    canon = _load_oracle_check().canon
    assert canon([-0.0, 1.5]) != canon([0.0, 1.5])


def test_multiline_parenthesized_relative_import_resolves_submodules():
    # "from ..pkg import (\n a,\n b)" previously captured names="(" and
    # silently dropped every submodule from the fingerprint (r7 ADVICE).
    from hadoop_word_score_spark.plans.queries import _resolve_rel_imports

    mods = _resolve_rel_imports(
        "from ..functions import (\n    codecs,\n    text as _t,\n)\n",
        ("operators",),
    )
    assert {"functions.__init__", "functions.codecs", "functions.text"} <= mods


def test_inline_comment_in_multiline_import_keeps_following_names():
    # review r8: a trailing '# ...' on one line of a parenthesized import
    # must not swallow the names on the following lines
    from hadoop_word_score_spark.plans.queries import _resolve_rel_imports

    mods = _resolve_rel_imports(
        "from ..functions import (\n    codecs,  # helper\n    text,\n)\n",
        ("operators",),
    )
    assert {"functions.__init__", "functions.codecs", "functions.text"} <= mods


def test_audit_wrap_detector_rejects_value_changing_epsilon():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools" / "signed_zero_audit.py"
    spec = importlib.util.spec_from_file_location("signed_zero_audit2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.round_sites("SELECT ROUND(x, 6) + 0.0 AS a") == [("ROUND(x, 6)", True)]
    assert mod.round_sites("SELECT ROUND(x, 6) + 0.01 AS a") == [("ROUND(x, 6)", False)]


def test_local_gate_reproduces_prefix_covariance_red(spark):
    # End-to-end replay of the r6/r7 driver red (VERDICT r7 item 2): the
    # PRE-fix covariance oracle (no "+ 0.0") emits -0.0 cells that the
    # sign-strict replica hash must now distinguish from the engine's +0.0
    # — i.e. the local gate FAILS the old oracle and PASSES the shipped
    # one against the same Spark output.
    import duckdb

    from hadoop_word_score_spark.operators.linalg import covariance_upper_rounded
    from hadoop_word_score_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    canon_mod = _load_oracle_check()
    em = load_table(spark, SF_SMOKE, "embeddings")
    sdf = covariance_upper_rounded(em, "embedding", 64, decimals=3)
    srows = [tuple(r) for r in sdf.collect()]
    sh = canon_mod.value_hash([c.lower() for c in sdf.columns], srows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    base = """
    WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               unnest(embedding) AS x FROM embeddings)
    SELECT a.i AS i, b.i AS j, ROUND(covar_pop(a.x, b.x), 3){fix} AS cov
    FROM e a JOIN e b USING (vec_id) WHERE a.i <= b.i
    GROUP BY a.i, b.i ORDER BY i, j
    """
    for fix, should_match in ((" + 0.0", True), ("", False)):
        rel = con.sql(base.format(fix=fix))
        oh = canon_mod.value_hash([c.lower() for c in rel.columns], rel.fetchall())
        assert (sh == oh) is should_match, (fix, sh, oh)


def test_registry_outputs_are_flat_scalar_columns(spark):
    # Output-format contract: the driver's pandas canonicalizer sorts and
    # factorizes every output column, which requires hashable scalar cells
    # — an Array/Map/Struct column crashes it before any comparison runs
    # (r8 red: inverted_index_terms, "unhashable type: numpy.ndarray").
    # This is the second round burned by output FORMAT rather than data
    # (r6/r7: signed zero), so the contract is now structural: every
    # registered query's result schema must be flat scalars. Queries that
    # genuinely produce collections must reduce them (delimited string,
    # exploded rows, or per-element columns) before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    from tests.conftest import SF_SMOKE

    offenders = []
    for name, spec in Q.REGISTRY.items():
        df = spec.fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "non-flat output columns (driver canonicalizer cannot hash them):\n"
        + "\n".join(offenders)
    )


def test_driver_budget_covers_the_oldest_evidence_cohort():
    # The point of round-robin-by-age scheduling: the driver's ~50-slot
    # budget must reach the globally oldest clean evidence instead of being
    # absorbed by a demoted family (r9 verdict #1: 39 names stuck at r5).
    # Structural form: the first 50 names are exactly a 50-smallest prefix
    # by history round — no name outside the prefix has a strictly older
    # history than any name inside it.
    names = list(Q.queries())
    budget, rest = names[:50], names[50:]
    if rest:
        max_in = max(Q._history_round(n) for n in budget)
        min_out = min(Q._history_round(n) for n in rest)
        assert max_in <= min_out, (max_in, min_out)
    # brand-new names (no ledger history) always lead the order
    lead_width = sum(1 for n in names if Q._history_round(n) == 0)
    assert all(Q._history_round(n) == 0 for n in names[:lead_width])
