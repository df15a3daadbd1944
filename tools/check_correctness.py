"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row count, column names/types, and
an order-insensitive value hash (rows sorted, columns sorted by name).

When run over the FULL registry (no name filter), writes
``CORRECTNESS_FULL.json`` next to the repo root — one entry per query
in the driver artifact's schema (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err) — so the complete gate result is a
committed artifact rather than a session log (the driver caps its own
``CORRECTNESS_r*.json`` at 50 entries).

Float policy: RAW equality by default — a Spark DOUBLE must equal the
DuckDB DOUBLE bit-for-bit (NaN == NaN), because the driver's gate
hashes raw values; the round-5 driver red row (markov `prob`) was
invisible locally precisely because this mirror used to round floats
to 6 decimals first. ``--lenient`` restores the old rounding for
debugging only. The registry's answer to float exposure is to not
emit derived DOUBLEs where a scaled integer is exact, and to pin any
genuinely-float math to one expression tree evaluated identically in
both engines.

Type policy (round 8): every query's OUTPUT TYPES must agree between
engines, not just values — the driver's value hash is Arrow-type-aware,
so a DuckDB HUGEINT (what ``sum(BIGINT)`` returns uncast) hashes
differently from Spark's BIGINT even when all values are equal. This
class cost three rounds on ``markov_transitions_ppm`` because raw
value equality (Python ``==``) cannot see it. The gate maps DuckDB
type names onto Spark ``simpleString`` names per column and fails on
any mismatch (HUGEINT, DECIMAL width, int-vs-bigint, ...).

Usage: python tools/check_correctness.py [--lenient] [--stability]
       [--types] [sf_dir] [name ...]
``--stability`` re-runs the Spark side of float-output queries and
fails on run-to-run value drift (shuffle-order float nondeterminism).
``--types`` runs ONLY the type-parity gate — no collect on either
side (Spark schema analysis and the DuckDB relation's type vector are
both lazy), so the full registry sweeps in seconds.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def normalize(rows: list[tuple], cols: list[str], lenient: bool = False):
    import struct

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if lenient:
                    v = round(v, 6)
                elif math.isnan(v):
                    v = "NaN"  # raw mode: NaN compares equal to NaN
                else:
                    # TRUE bit-for-bit raw mode (ADVICE r6 #4): Python
                    # == is value equality (-0.0 == 0.0, 1 == 1.0),
                    # weaker than a driver-side hash of raw values —
                    # compare the IEEE bit pattern instead, which also
                    # distinguishes float 1.0 from int 1 by type tag
                    v = ("f64", struct.pack("<d", v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


_DUCK_SCALARS = {
    "BIGINT": "bigint", "INTEGER": "int", "INT": "int",
    "SMALLINT": "smallint", "TINYINT": "tinyint",
    "HUGEINT": "hugeint",  # no Spark equivalent — always a mismatch
    "UBIGINT": "ubigint", "UINTEGER": "uint",
    "DOUBLE": "double", "FLOAT": "float", "REAL": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "BLOB": "binary",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "DATE": "date",
}


def duck_type_to_spark(t: str) -> str:
    """Map a DuckDB type name onto Spark's ``simpleString`` vocabulary.

    Returns a name that will simply never equal a Spark type (e.g.
    ``hugeint``) when DuckDB's type has no Spark counterpart — that IS
    the signal: the oracle must cast it.
    """
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    u = t.upper()
    if u in _DUCK_SCALARS:
        return _DUCK_SCALARS[u]
    if u.startswith("DECIMAL"):
        return u.lower().replace(" ", "")
    if u.startswith("STRUCT"):
        # struct field grammar differs too much to map textually; the
        # registry has no struct outputs today — flag loudly if one appears
        return f"struct?{t}"
    return f"?{t}"


def type_mismatches(
    scols: list[str], stypes: list[str], dcols: list[str], dtypes: list[str]
) -> list[str]:
    """Per-column-name Spark-vs-DuckDB output type diffs (shared names)."""
    smap = dict(zip(scols, stypes))
    dmap = {c: duck_type_to_spark(t) for c, t in zip(dcols, dtypes)}
    return [
        f"{c}: spark={smap[c]} duck={dmap[c]}"
        for c in smap
        if c in dmap and smap[c] != dmap[c]
    ]


def main() -> int:
    import os

    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_artifacts import check as artifact_check
    from twitch_chat_analyser_spark.session import get_spark

    argv = [
        a
        for a in sys.argv[1:]
        if a not in ("--lenient", "--stability", "--types")
    ]
    lenient = "--lenient" in sys.argv[1:]
    types_only = "--types" in sys.argv[1:]
    # --stability: for every query whose output carries a DOUBLE/FLOAT
    # column, execute the SPARK side twice and compare the normalized
    # value sets of the two runs. This catches SHUFFLE-ORDER float
    # nondeterminism (a sum whose value depends on partition merge
    # order) — invisible to a single spark-vs-oracle pass, which can
    # coincidentally agree on one run and flake on the driver's.
    stability = "--stability" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    drift = artifact_check()
    for p in drift:
        print(f"  ARTIFACT DRIFT: {p}")

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Cross-scale gate (VERDICT r11 task 2): a FULL-registry run at a
    # non-sf0.01 dir is the 10x-up correctness sweep — it skips the
    # declared quadratic-oracle queries (registry.SCALE_EXCLUDED, each
    # with a written reason) and records its result as
    # CORRECTNESS_SCALE.json, which check_artifacts.py asserts exists,
    # covers the whole non-excluded registry, and is green.
    from twitch_chat_analyser_spark.registry import SCALE_EXCLUDED

    scale_mode = (
        not only
        and not types_only
        and os.path.basename(os.path.normpath(sf_dir)) != "sf0.01"
    )
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if scale_mode and name in SCALE_EXCLUDED:
            print(f"  {name}: excluded at scale ({SCALE_EXCLUDED[name][:60]}...)")
            continue
        t0 = time.time()
        entry = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = entry
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
            srows = (
                [] if types_only else [tuple(r) for r in sdf.collect()]
            )
        except Exception as e:  # noqa: BLE001 — gate must record, not die
            entry["err"] = f"spark: {e}"
            failures.append((name, entry["err"]))
            print(f"  {name}: FAIL {entry['err']} [{time.time()-t0:.1f}s]")
            continue
        if types_only:
            if name not in oracles:
                print(f"  {name}: (no oracle — skipped) [{time.time()-t0:.1f}s]")
                continue
            try:
                rel = con.sql(oracles[name])
                tdiffs = type_mismatches(
                    scols, stypes, rel.columns, [str(t) for t in rel.types]
                )
            except Exception as e:  # noqa: BLE001
                entry["err"] = f"oracle: {e}"
                failures.append((name, entry["err"]))
                print(f"  {name}: FAIL {entry['err']} [{time.time()-t0:.1f}s]")
                continue
            entry["type_match"] = not tdiffs
            if tdiffs:
                failures.append((name, f"TYPES {tdiffs}"))
                print(f"  {name}: FAIL TYPES {tdiffs} [{time.time()-t0:.1f}s]")
            else:
                print(f"  {name}: OK types [{time.time()-t0:.1f}s]")
            continue
        entry["spark_rows"] = len(srows)
        status = []
        if stability and any(
            f.dataType.simpleString() in ("double", "float")
            for f in sdf.schema.fields
        ):
            srows2 = [tuple(r) for r in fn(spark, sf_dir).collect()]
            if normalize(srows, scols, lenient) != normalize(
                srows2, scols, lenient
            ):
                status.append("UNSTABLE spark run-to-run float values")
        if name not in oracles:
            print(f"  {name}: rows={len(srows)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                entry["err"] = "0 rows"
                failures.append((name, "0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"oracle: {e}"
            failures.append((name, entry["err"]))
            print(f"  {name}: FAIL {entry['err']} [{time.time()-t0:.1f}s]")
            continue
        entry["oracle_rows"] = len(drows)
        entry["schema_match"] = sorted(scols) == sorted(dcols)
        entry["rows_match"] = len(srows) == len(drows)
        tdiffs = type_mismatches(scols, stypes, dcols, dtypes)
        entry["type_match"] = not tdiffs
        if tdiffs:
            status.append(f"TYPES {tdiffs}")
        if not entry["schema_match"]:
            status.append(f"COLS spark={sorted(scols)} duck={sorted(dcols)}")
        if not entry["rows_match"]:
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(drows)}")
        if not status:
            a = normalize(srows, scols, lenient)
            b = normalize(drows, dcols, lenient)
            entry["hash_match"] = a == b
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES first-diffs={diffs}")
        else:
            entry["hash_match"] = False
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name}: FAIL {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"  {name}: OK rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass at {sf_dir}")
    # types-only sweeps must NOT overwrite the committed full-gate
    # artifact — their entries carry no row/hash results
    if not only and not types_only:
        # full-registry run: commitably record the complete gate result
        # (CORRECTNESS_FULL at sf0.01; CORRECTNESS_SCALE at the bench
        # scale, with the quadratic-oracle exclusions spelled out)
        import json

        art = {"sf_dir": sf_dir, "n_queries": len(results),
               "n_fail": len(failures), "queries": results}
        fname = "CORRECTNESS_FULL.json"
        if scale_mode:
            fname = "CORRECTNESS_SCALE.json"
            art["excluded"] = dict(SCALE_EXCLUDED)
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            fname,
        )
        with open(out_path, "w") as fh:
            json.dump(art, fh, indent=1)
        print(f"wrote {out_path}")
        # re-check drift now that the artifact is freshly written: a
        # stale CORRECTNESS_FULL must not fail the run that refreshes it
        drift = artifact_check()
        for p in drift:
            print(f"  ARTIFACT DRIFT: {p}")
    if drift:
        print(f"artifact contract: {len(drift)} problem(s) (see top)")
    return 1 if failures or drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
