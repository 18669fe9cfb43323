-- Publish the top-10 users by total value from the incrementally
-- maintained stats table (SQL node: template render -> spark.sql).
select user_id, n_events, n_purchases, total_value, last_event
from {{ stats }}
order by total_value desc, user_id asc
limit 10
