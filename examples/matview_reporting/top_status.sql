SELECT o_orderstatus,
       revenue_cents,
       n_orders,
       max_order_cents,
       CAST(revenue_cents / n_orders AS BIGINT) AS avg_order_cents
FROM {{ sales_by_status }}
ORDER BY revenue_cents DESC
