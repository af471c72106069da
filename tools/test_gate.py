#!/usr/bin/env python3
"""Regression test for the gate itself (r5 verdict item #2).

The r5 driver failed `events_json_props` on hash because its oracle SQL
returned HUGEINT (DuckDB SUM(BIGINT)) while Spark emits int64 — and the
old pandas-based compare coerced that difference away, so the local gate
passed on a query the driver failed. This test replays exactly that
scenario against the hardened Arrow-level gate:

  1. the UNFIXED SQL (bare SUM -> HUGEINT) must FAIL with a TYPES diff;
  2. the FIXED SQL (CAST ... AS BIGINT) must PASS.

Usage: python3 tools/test_gate.py   (exit 0 = gate catches the class)
"""
import os, sys, tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from compare_oracle import cmp_frames, scan_oracle_portability

def run():
    with tempfile.TemporaryDirectory() as d:
        # what Spark's Verify dump would contain: sum_k as int64
        spark_tbl = pa.table({
            "event_type": pa.array(["click", "view"], pa.string()),
            "sum_k": pa.array([10, 20], pa.int64())})
        con = duckdb.connect()
        con.execute("CREATE TABLE ev AS SELECT * FROM (VALUES "
                    "('click', 4), ('click', 6), ('view', 20)) t(event_type, k)")

        unfixed = ("SELECT event_type, SUM(CAST(k AS BIGINT)) AS sum_k "
                   "FROM ev GROUP BY 1 ORDER BY 1")
        fixed = ("SELECT event_type, CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) "
                 "AS sum_k FROM ev GROUP BY 1 ORDER BY 1")

        r_unfixed = cmp_frames("unfixed", spark_tbl,
                               con.execute(unfixed).fetch_arrow_table())
        r_fixed = cmp_frames("fixed", spark_tbl,
                             con.execute(fixed).fetch_arrow_table())

        ok = True
        if "TYPES differ" not in r_unfixed:
            print(f"GATE REGRESSION: unfixed HUGEINT SQL should fail, got: {r_unfixed}")
            ok = False
        else:
            print(f"ok: unfixed SQL rejected -> {r_unfixed}")
        if ": OK" not in r_fixed:
            print(f"GATE REGRESSION: fixed SQL should pass, got: {r_fixed}")
            ok = False
        else:
            print(f"ok: fixed SQL accepted -> {r_fixed}")

        # date-vs-timestamp is also type-checked (caught two latent
        # mismatches in r6: agg_monthly_revenue / agg_yoy_growth)
        ts_tbl = pa.table({"m": pa.array([0], pa.timestamp("us"))})
        r_date = cmp_frames("date_vs_ts", ts_tbl,
                            con.execute("SELECT DATE '1970-01-01' AS m").fetch_arrow_table())
        if "TYPES differ" not in r_date:
            print(f"GATE REGRESSION: timestamp-vs-date should fail, got: {r_date}")
            ok = False
        else:
            print(f"ok: timestamp-vs-date rejected -> {r_date}")
        # r7 class: engine-version-sensitive oracle constructs must be
        # rejected STATICALLY — the local DuckDB agreeing is not evidence
        # of portability (it agreed in r7 and the driver's didn't).
        bad_oracles = {
            "hex_cast": "SELECT BIT_XOR(CAST('0x' || substr(md5(x),1,15) "
                        "AS BIGINT)) FROM t",
            "decimal_narrow": "SELECT CAST(SUM(h) AS DECIMAL(38,0)) FROM t",
            "hugeint": "SELECT CAST(x AS HUGEINT) FROM t",
            "intdiv": "SELECT x // 7 FROM t",
        }
        good_oracles = {
            "arith_hex": "SELECT BIT_XOR(h) FROM (SELECT "
                         "(instr('0123456789abcdef', substr(m,1,1)) - 1) * 16 "
                         "AS h FROM t)",
            "url": "SELECT 'http://a/b' AS u FROM t",  # // inside :// is fine
            "bigint_sum": "SELECT CAST(SUM(h % 1048573) AS BIGINT) FROM t",
        }
        hits = scan_oracle_portability(bad_oracles)
        flagged = {n for n, _ in hits}
        if flagged != set(bad_oracles):
            print(f"GATE REGRESSION: portability probe missed "
                  f"{set(bad_oracles) - flagged}")
            ok = False
        else:
            print(f"ok: portability probe flags all {len(bad_oracles)} "
                  "version-sensitive spellings")
        false_pos = scan_oracle_portability(good_oracles)
        if false_pos:
            print(f"GATE REGRESSION: portability probe false-positives: {false_pos}")
            ok = False
        else:
            print("ok: portability probe passes portable spellings")
        return 0 if ok else 1

if __name__ == "__main__":
    sys.exit(run())
