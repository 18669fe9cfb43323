SELECT nation, revenue_cents, n_orders
FROM {{ rev_named }}
ORDER BY revenue_cents DESC
