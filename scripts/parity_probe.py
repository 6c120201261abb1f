"""Empirical parity probe: PySpark vs DuckDB function behavior.

Run once during development to pin down cross-engine-deterministic
building blocks (portable hashing, tokenization, types) used by the
oracle-checked query catalog.
"""
import duckdb

con = duckdb.connect()
print("== DuckDB ==")
for name, sql in [
    ("hex cast", "SELECT ('0x'||substr(md5('hello'),1,15))::BIGINT"),
    ("md5", "SELECT md5('hello')"),
    ("split empty sep", "SELECT string_split('abc','')"),
    ("split space trailing", "SELECT string_split('a b ',' ')"),
    ("sum bigint type", "SELECT typeof(sum(x)) FROM (SELECT 1::BIGINT x)"),
    ("sum int cast", "SELECT CAST(sum(x) AS BIGINT) FROM (SELECT 1::BIGINT x)"),
    ("count type", "SELECT typeof(count(*)) FROM (SELECT 1)"),
    ("year type", "SELECT typeof(year(TIMESTAMP '2024-01-01'))"),
    ("list_intersect", "SELECT list_intersect([1,2,3],[2,3,4])"),
    ("list_distinct", "SELECT list_distinct([1,1,2])"),
    ("list_sort", "SELECT list_sort(['b','a'])"),
    ("list_dot", "SELECT list_dot_product([1.0,2.0]::DOUBLE[],[3.0,4.0]::DOUBLE[])"),
    ("strftime", "SELECT strftime(TIMESTAMP '2024-01-02 03:04:05', '%Y-%m-%d %H:%M:%S')"),
    ("epoch", "SELECT CAST(epoch(TIMESTAMP '2024-01-02 03:04:05') AS BIGINT)"),
    ("json", "SELECT json_extract_string('{\"k\": 87}', '$.k')"),
    ("date_trunc", "SELECT date_trunc('hour', TIMESTAMP '2024-01-02 03:04:05')"),
    ("generate_series lateral", "SELECT i, substring('abc', i, 1) FROM generate_series(1,3) t(i)"),
    ("round mode", "SELECT round(2.5::DOUBLE,0), round(3.5::DOUBLE,0), round(-2.5::DOUBLE,0), round(0.125::DOUBLE,2)"),
    ("ascii", "SELECT ascii('A')"),
    ("conv-like", "SELECT typeof(('0x'||substr(md5('hello'),1,15))::BIGINT)"),
    ("stddev", "SELECT typeof(stddev_samp(x)) FROM (SELECT 1.0::DOUBLE x)"),
]:
    try:
        print(f"{name:24s}", con.execute(sql).fetchall())
    except Exception as e:
        print(f"{name:24s} ERROR: {e}")
try:
    print("asof join", con.execute("""
      SELECT * FROM (SELECT 5 AS t) a ASOF JOIN (SELECT 3 AS t, 'x' AS v UNION ALL SELECT 7, 'y') b
      ON a.t >= b.t
    """).fetchall())
except Exception as e:
    print("asof join ERROR:", e)
