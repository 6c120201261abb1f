from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]").appName("probe")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(1)
exprs = {
    "md5": "md5('hello')",
    "conv hash": "CAST(conv(substr(md5('hello'),1,15),16,10) AS BIGINT)",
    "split empty": "split('abc','')",
    "split space trailing": "split('a b ',' ')",
    "round mode": "array(round(CAST(2.5 AS DOUBLE),0), round(CAST(3.5 AS DOUBLE),0), round(CAST(-2.5 AS DOUBLE),0), round(CAST(0.125 AS DOUBLE),2))",
    "date_format": "date_format(TIMESTAMP '2024-01-02 03:04:05','yyyy-MM-dd HH:mm:ss')",
    "epoch": "CAST(unix_timestamp(TIMESTAMP '2024-01-02 03:04:05') AS BIGINT)",
    "json": "get_json_object('{\"k\": 87}', '$.k')",
    "ascii": "ascii('A')",
    "year type": "year(TIMESTAMP '2024-01-02')",
    "array_intersect": "array_intersect(array(1,2,3),array(2,3,4))",
    "agg dot": "aggregate(zip_with(array(1.0D,2.0D),array(3.0D,4.0D),(x,y)->x*y), 0D, (a,b)->a+b)",
    "date_trunc": "date_trunc('hour', TIMESTAMP '2024-01-02 03:04:05')",
    "sequence": "sequence(1,3)",
}
row = df.selectExpr(*[f"{e} AS `{n}`" for n, e in exprs.items()]).collect()[0]
for n in exprs:
    print(f"{n:24s}", repr(row[n]))
print("schema:", df.selectExpr(*[f"{e} AS `{n}`" for n, e in exprs.items()]).dtypes)
spark.stop()
