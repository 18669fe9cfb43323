SELECT source,
       count(*) AS n_docs,
       cast(sum(n_chars) AS bigint) AS total_chars
FROM {{ kept }}
GROUP BY source
