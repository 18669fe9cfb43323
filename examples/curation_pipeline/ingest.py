"""Ingest: fixture documents -> versioned engine table."""
from patterns import Parameter, Table, get_spark

sf_dir = Parameter("sf_dir")

docs = Table("docs", "w")
spark = get_spark()
docs.replace(spark.read.parquet(f"{sf_dir}/documents.parquet"))
