import duckdb, os
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
  .config("spark.sql.shuffle.partitions","4")
  .config("spark.sql.session.timeZone","UTC")
  .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
d='/root/testdata/sf0.001'
con = duckdb.connect()
for t in ['events','documents','embeddings','orders','lineitem']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    spark.read.parquet(f'{d}/{t}.parquet').createOrReplaceTempView(t)

def both(name, ssql, dsql=None):
    dsql = dsql or ssql
    try: s = spark.sql(ssql).collect()
    except Exception as e: s = f"SPARK-ERR {str(e)[:200]}"
    try: dd = con.execute(dsql).fetchall()
    except Exception as e: dd = f"DUCK-ERR {str(e)[:200]}"
    match = str(s)==str(dd) if isinstance(s,list) and isinstance(dd,list) else False
    sr = [tuple(r) for r in s] if isinstance(s,list) else s
    print(f"== {name}: match={match}\n  spark: {sr}\n  duck : {dd}")

# 1. ns timestamp read
both("ts_read", "SELECT ts FROM events ORDER BY event_id LIMIT 2")
# 2. md5 of int-cast
both("md5", "SELECT md5(CAST(event_id AS STRING) || '|x') FROM events ORDER BY event_id LIMIT 2",
           "SELECT md5(CAST(event_id AS VARCHAR) || '|x') FROM events ORDER BY event_id LIMIT 2")
# 3. hex
both("hex", "SELECT lower(lpad(hex(event_id*64+100),8,'0')) FROM events ORDER BY event_id LIMIT 2",
           "SELECT lower(lpad(to_hex(event_id*64+100),8,'0')) FROM events ORDER BY event_id LIMIT 2")
# conv back
both("conv", "SELECT conv(lpad(hex(event_id+64),8,'0'),16,10) FROM events ORDER BY event_id LIMIT 2",
            "SELECT CAST(event_id+64 AS VARCHAR) FROM events ORDER BY event_id LIMIT 2")
# 4. split index
both("split", "SELECT split(source,'c')[1] FROM documents ORDER BY doc_id LIMIT 2",
             "SELECT split_part(source,'c',2) FROM documents ORDER BY doc_id LIMIT 2")
# 5. posexplode vs generate_subscripts
both("posexp", "SELECT o_orderkey, pos, v FROM orders LATERAL VIEW posexplode(array(o_totalprice, CAST(o_custkey AS DOUBLE))) t AS pos, v WHERE o_orderkey<3 ORDER BY o_orderkey, pos",
              "SELECT o_orderkey, generate_subscripts([o_totalprice, CAST(o_custkey AS DOUBLE)],1)-1 AS pos, unnest([o_totalprice, CAST(o_custkey AS DOUBLE)]) AS v FROM orders WHERE o_orderkey<3 ORDER BY o_orderkey, pos")
# 6. json
both("json", "SELECT get_json_object(props,'$.k') FROM events ORDER BY event_id LIMIT 3",
            "SELECT CAST(json_extract(props,'$.k') AS VARCHAR) FROM events ORDER BY event_id LIMIT 3")
# 7. translate
both("translate", "SELECT translate(source,'rs','xy') FROM documents ORDER BY doc_id LIMIT 2")
# 8. duckdb asof join syntax
try:
    r = con.execute("""
      SELECT e.event_id, s.event_id AS prior FROM (SELECT * FROM events WHERE event_type='purchase') e
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts ORDER BY e.event_id LIMIT 3""").fetchall()
    print("== asof ok:", r)
except Exception as e: print("== asof DUCK-ERR", str(e)[:300])
# 9. epoch round trip
both("epoch", "SELECT date_format(timestamp_seconds(CAST(unix_timestamp(ts) AS BIGINT)),'yyyy-MM-dd HH:mm:ss') FROM events ORDER BY event_id LIMIT 2",
             "SELECT strftime(to_timestamp(CAST(epoch(ts) AS BIGINT)),'%Y-%m-%d %H:%M:%S') FROM events ORDER BY event_id LIMIT 2")
# 10. string_split on regex + whitespace tokens
both("tok", r"SELECT size(split(trim(text),'\\s+')) FROM documents ORDER BY doc_id LIMIT 3",
           r"SELECT length(string_split_regex(trim(text),'\s+')) FROM documents ORDER BY doc_id LIMIT 3")
# 11. sorted distinct words fingerprint
both("fp", "SELECT md5(array_join(array_sort(array_distinct(split(text,' '))),' ')) FROM documents ORDER BY doc_id LIMIT 2",
          "SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) FROM documents ORDER BY doc_id LIMIT 2")
# 12. decimal dot product on embeddings
both("dot", """SELECT vec_id, CAST(aggregate(zip_with(embedding, embedding, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0 AS DECIMAL(28,12)), (acc,z) -> acc + CAST(z AS DECIMAL(28,12))) AS DOUBLE) AS dot FROM embeddings ORDER BY vec_id LIMIT 3""",
           """SELECT vec_id, CAST(list_sum(list_transform(list_zip(embedding, embedding), z -> CAST(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS dot FROM embeddings ORDER BY vec_id LIMIT 3""")
