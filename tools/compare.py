#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
testdata tables in <sfDir>, and compares: row count, column names, and
cell values (columns sorted by name, rows sorted by all columns, floats
compared bit-exactly and with a 1e-9 fallback report).
"""
import sys, os, json, math
import duckdb
import pyarrow.dataset as ds

def canon(rows, cols):
    # sort columns by name, then rows by string repr of all cells
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(c) for c in r))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
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
            print(f"{name:24s} {status} rows={len(got_rows)}")
            continue
        try:
            res = con.execute(oracles[name])
            exp_cols = [c[0] for c in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"{name:24s} FAIL cols got={gc} exp={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"{name:24s} FAIL rows got={len(gr)} exp={len(er)}")
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
            n_fail += 1
        else:
            print(f"{name:24s} pass rows={len(gr)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
