"""Curate: quality floor -> domain mix -> exact dedup survivors."""
from patterns import Parameter, Table
from patterns_devkit_spark.operators.dedup import exact_dedup
from patterns_devkit_spark.operators.det_hash import md5_long
from patterns_devkit_spark.operators.text import quality_score
from pyspark.sql import functions as F

min_quality_permille = Parameter("min_quality_permille", type=int)
mix_permille = Parameter("mix_permille", type=int)

docs = Table("docs", "r")
out = Table("kept", "w")

df = docs.read_spark()
scored = quality_score(df, "text").filter(
    F.round(F.col("quality_score") * 1000) >= min_quality_permille
)
mixed = scored.filter(
    md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
    < mix_permille
)
keep_ids = exact_dedup(mixed, "text", "doc_id").select(
    F.col("keep_id").alias("doc_id")
)
out.replace(mixed.join(keep_ids, "doc_id", "left_semi"))
