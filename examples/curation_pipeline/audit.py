"""Gate: declarative constraint audit over the ingested corpus."""
from patterns import Table
from patterns_devkit_spark.operators.quality import Check, constraint_audit

docs = Table("docs", "r")
out = Table("audit", "w")

df = docs.read_spark()
result = constraint_audit(
    {"docs": df},
    [
        Check("doc_id_unique", "docs", "unique", cols=["doc_id"]),
        Check("text_not_null", "docs", "not_null", cols=["text"]),
        Check("n_chars_positive", "docs", "in_range", cols=["n_chars"], lo=1, hi=10**9),
    ],
)
out.replace(result)
