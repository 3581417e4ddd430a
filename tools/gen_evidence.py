"""Regenerate the driver-evidence ledger blocks in plans/queries.py.

Usage:  python tools/gen_evidence.py CORRECTNESS_r05.json 5

Prints two code blocks to paste into ``hadoop_word_score_spark/plans/
queries.py`` after a new driver round lands:

  1. ``_DRIVER_GREEN_R{N}`` — the names the round-N driver touched (every
     key in the CORRECTNESS file; red rows are excluded loudly, since a
     failed check is not evidence of correctness).
  2. the refreshed ``_VERIFIED_ORACLE_FP`` dict — entries for round-N names
     are updated to the CURRENT oracle fingerprint (the driver just checked
     exactly that text); all other entries are carried over unchanged, so a
     query whose oracle was rewritten without a fresh driver run keeps its
     stale fingerprint and correctly demotes to the never-verified tier.

Rationale (r4 postmortem, VERDICT.md): evidence keyed by name alone let
re-oracled queries ride on stale "green" rows; keying by (name, oracle
fingerprint) makes an oracle rewrite reset the query's evidence to zero.
"""

from __future__ import annotations

import json
import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_word_score_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    _IMPL_DEMOTED,
    _VERIFIED_IMPL_FP,
    _VERIFIED_ORACLE_FP,
    _impl_fp,
    _oracle_fp,
)


def main(correctness_path: str, round_no: int) -> None:
    results = json.load(open(correctness_path))
    green, red = [], []
    for name, row in sorted(results.items()):
        # hash green, or rows-only green for queries with no oracle by nature.
        # schema_match mirrors the driver's full rows+schema+hash gate: a row
        # with matching values but a mismatched schema is NOT verified.
        ok = (
            row.get("err") is None
            and row.get("rows_match")
            and row.get("schema_match", True)
            and (
                row.get("hash_match") or name not in {
                    n for n, s in REGISTRY.items() if s.oracle is not None
                }
            )
        )
        (green if ok else red).append(name)
    if red:
        print(f"# !! {len(red)} non-green rows EXCLUDED from the ledger: {red}",
              file=sys.stderr)

    body = ", ".join(f'"{n}"' for n in green)
    wrapped = textwrap.fill(body, width=76, initial_indent="    ",
                            subsequent_indent="    ")
    print(f"_DRIVER_GREEN_R{round_no:02d} = frozenset({{\n{wrapped}\n}})\n")

    fp = dict(_VERIFIED_ORACLE_FP)
    for name in green:
        spec = REGISTRY.get(name)
        if spec is not None:
            fp[name] = _oracle_fp(spec.oracle)
    print("_VERIFIED_ORACLE_FP: dict[str, str] = {")
    for name in sorted(fp):
        print(f'    "{name}": "{fp[name]}",')
    print("}")

    # Implementation fingerprints: a driver green attests the CURRENT code
    # of the query fn and every engine module it transitively imports.
    ifp = dict(_VERIFIED_IMPL_FP)
    for name in green:
        spec = REGISTRY.get(name)
        if spec is not None:
            ifp[name] = _impl_fp(spec.fn)
    print("\n_VERIFIED_IMPL_FP: dict[str, str] = {")
    for name in sorted(ifp):
        print(f'    "{name}": "{ifp[name]}",')
    print("}")

    # a fresh driver green clears a manual implementation demotion
    still_demoted = sorted(_IMPL_DEMOTED - set(green))
    body = ", ".join(f'"{n}"' for n in still_demoted) or ""
    print(f"\n_IMPL_DEMOTED: frozenset[str] = frozenset({{{body}}})")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], int(sys.argv[2]))
