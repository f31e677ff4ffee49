#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json <artifact>]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
testdata tables in <sfDir>, and compares: row count, column names, and
cell values (columns sorted by name, rows sorted by all columns, floats
compared bit-exactly and with a 1e-9 fallback report).

--json writes a per-query machine-readable artifact (name -> {status,
rows}) in the CORRECTNESS_r*.json spirit, so non-driver gates (e.g. the
FIXTURE-SERVED pass below) leave a durable committed record.

FIXTURE-SERVED POSTURE: the benches serve one-time derived artifacts
(ANN indexes, ranked frames, graph edges, gram frames, the base dedup
band index) from the content-stamped FixtureStore, while a plain
`graft.Verify` dump rebuilds them inline. Since round 18 the plain run
gates BOTH postures itself: after the inline dump it obtains every
fixture, re-runs the posture-sensitive queries on their served paths,
asserts bit-exact parity against the inline parquet (writing
<out>/fixture_parity.json), and exits nonzero on divergence — so the
driver's single invocation covers both sides of every fixture == rebuilt
equivalence. The explicit served-only dump remains available for a full
DuckDB gate of the served paths alone:

    GRAFT_VERIFY_FIXTURES=1 sbt "runMain graft.Verify <sfDir> <out>"
    python3 tools/compare.py <sfDir> <out> --json CORRECTNESS_fixtures.json

(tools/verify_fixtures.sh wraps this pair.)
"""
import sys, os, json, math
import duckdb
import pyarrow.dataset as ds
import pyarrow.types as pt

def normtype(t):
    """Normalize an Arrow type for oracle-vs-Spark parity.

    String/binary width variants (string vs large_string) and timezone
    annotations are representation details the two writers legitimately
    differ on; integer WIDTH and decimal-vs-integer are exactly the class
    that burned orders_pareto for two rounds (DuckDB HUGEINT -> Arrow
    decimal128 vs Spark int64) and stay STRICT.
    """
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{normtype(t.value_type)}>"
    return str(t)

def typemap(schema):
    return {f.name: normtype(f.type) for f in schema}

def canon(rows, cols):
    # sort columns by name, then rows by string repr of all cells
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(c) for c in r))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    record = {}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        src = None
        if os.path.isdir(p):
            # Spark-written table (ScaleUp corpora): directory of part files
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        if src:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
            if t == "events":
                # ScaleUp writes ts as raw int64 NANOS (the engine's declared
                # unit); the oracles expect a timestamp column like the
                # driver corpora carry — normalize via floor-to-micros
                typ = con.execute(
                    "SELECT data_type FROM duckdb_columns() "
                    "WHERE table_name='events' AND column_name='ts'"
                ).fetchone()[0]
                if typ == "BIGINT":
                    con.execute("DROP VIEW events")
                    con.execute(
                        f"CREATE VIEW events AS SELECT * REPLACE ("
                        f"make_timestamp((ts - (ts % 1000 + 1000) % 1000)"
                        f" // 1000) AS ts) FROM {src}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        tbl = ds.dataset(d, format="parquet").to_table()
        got_cols = tbl.column_names
        got_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        if name not in oracles:
            status = "ROWS-ONLY " + ("pass" if len(got_rows) > 0 else "FAIL(empty)")
            if len(got_rows) > 0: n_pass += 1
            else: n_fail += 1
            record[name] = {"status": status, "rows": len(got_rows)}
            print(f"{name:24s} {status} rows={len(got_rows)}")
            continue
        try:
            res = con.execute(oracles[name])
            exp_cols = [c[0] for c in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {e}")
            record[name] = {"status": f"ORACLE-ERROR {e}", "rows": None}
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"{name:24s} FAIL cols got={gc} exp={ec}")
            record[name] = {"status": "FAIL cols", "rows": len(gr)}
            n_fail += 1
            continue
        # standing TYPE-PARITY gate: the driver's hasher is type-sensitive
        # (decimal128-vs-int64 failed orders_pareto for two rounds while a
        # value-only comparator passed) — fetch the oracle result as Arrow
        # and require each column's normalized type to match the Spark
        # parquet output exactly
        exp_types = typemap(con.execute(oracles[name]).arrow().schema)
        got_types = typemap(tbl.schema)
        skew = {c: (got_types[c], exp_types[c]) for c in got_types
                if got_types[c] != exp_types.get(c, got_types[c])}
        if skew:
            print(f"{name:24s} FAIL type-skew (col: spark vs oracle) {skew}")
            record[name] = {"status": f"FAIL type-skew {skew}", "rows": len(gr)}
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"{name:24s} FAIL rows got={len(gr)} exp={len(er)}")
            record[name] = {"status": f"FAIL rows got={len(gr)} exp={len(er)}",
                            "rows": len(gr)}
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                same = (x == y)
                if not same and isinstance(x, float) and isinstance(y, float):
                    same = (math.isnan(x) and math.isnan(y))
                if not same:
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, cname, x, y = bad
            near = isinstance(x, float) and isinstance(y, float) and \
                   abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
            print(f"{name:24s} FAIL cell row={i} col={cname} got={x!r} exp={y!r}"
                  f"{' (within 1e-9!)' if near else ''}")
            record[name] = {"status": f"FAIL cell col={cname}", "rows": len(gr)}
            n_fail += 1
        else:
            print(f"{name:24s} pass rows={len(gr)}")
            record[name] = {"status": "pass", "rows": len(gr)}
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "fixtures_served":
                       os.environ.get("GRAFT_VERIFY_FIXTURES") == "1",
                       "queries": record}, f, indent=0, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
