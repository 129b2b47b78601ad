-- sample shipped resource for SQLResourceTransformation
SELECT * FROM $table ORDER BY $order_col LIMIT $n
