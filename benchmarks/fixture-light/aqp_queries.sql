SELECT COUNT(*) FROM lineitem WHERE lineitem.l_discount <= 0.06
SELECT SUM(lineitem.l_extendedprice) FROM lineitem WHERE lineitem.l_quantity < 25
SELECT AVG(lineitem.l_quantity) FROM lineitem WHERE lineitem.l_discount BETWEEN 0.02 AND 0.08
SELECT COUNT(*) FROM orders WHERE orders.o_totalprice > 150000
SELECT SUM(orders.o_totalprice) FROM orders WHERE orders.o_orderstatus = 'F'
SELECT AVG(orders.o_totalprice) FROM orders WHERE orders.o_orderpriority = '1-URGENT'
SELECT COUNT(*), AVG(lineitem.l_quantity) FROM lineitem WHERE lineitem.l_returnflag = 'A' GROUP BY lineitem.l_linestatus
SELECT SUM(lineitem.l_extendedprice) FROM lineitem WHERE lineitem.l_discount <= 0.05 GROUP BY lineitem.l_returnflag
SELECT AVG(lineitem.l_extendedprice) FROM lineitem GROUP BY lineitem.l_returnflag
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderstatus = 'F' AND lineitem.l_quantity < 30
SELECT SUM(lineitem.l_quantity) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderpriority = '1-URGENT'
SELECT AVG(lineitem.l_extendedprice) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_totalprice > 100000
SELECT COUNT(*) FROM events WHERE events.value <= 100
SELECT SUM(events.value) FROM events WHERE events.event_type = 'purchase'
SELECT AVG(events.value) FROM events WHERE events.event_type = 'click' GROUP BY events.event_type
SELECT SUM(lineitem.l_extendedprice * lineitem.l_discount) FROM lineitem WHERE lineitem.l_quantity < 25
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_mktsegment = 'BUILDING' GROUP BY orders.o_orderstatus
SELECT AVG(orders.o_totalprice) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_acctbal > 0 GROUP BY customer.c_mktsegment
SELECT COUNT(DISTINCT lineitem.l_quantity) FROM lineitem WHERE lineitem.l_discount <= 0.05
SELECT COUNT(DISTINCT orders.o_orderpriority) FROM orders WHERE orders.o_totalprice > 100000
SELECT COUNT(DISTINCT events.event_type) FROM events WHERE events.value > 50
SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08) GROUP BY lineitem.l_returnflag
SELECT SUM(lineitem.l_extendedprice) FROM lineitem WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)
SELECT COUNT(*) FROM events WHERE (events.event_type = 'purchase' OR events.value > 150) GROUP BY events.event_type
SELECT COUNT(*) AS cnt FROM orders GROUP BY orders.o_orderstatus HAVING cnt >= 1000
SELECT SUM(lineitem.l_quantity) AS sq FROM lineitem GROUP BY lineitem.l_returnflag HAVING sq > 100000
SELECT COUNT(*) AS cnt FROM events WHERE events.value <= 150 GROUP BY events.event_type HAVING cnt >= 500
SELECT AVG(orders.o_totalprice) FROM orders WHERE (orders.o_orderstatus = 'F' OR orders.o_totalprice > 200000) GROUP BY orders.o_orderpriority
SELECT COUNT(DISTINCT lineitem.l_linestatus) FROM lineitem WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08) GROUP BY lineitem.l_returnflag
SELECT COUNT(DISTINCT events.event_type) FROM events WHERE (events.value < 50 OR events.value > 150)
SELECT AVG(lineitem.l_extendedprice) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND (orders.o_totalprice > 150000 OR lineitem.l_quantity > 30)
SELECT COUNT(DISTINCT orders.o_orderpriority) FROM orders WHERE (orders.o_orderstatus = 'F' OR orders.o_totalprice > 200000) GROUP BY orders.o_orderstatus
SELECT COUNT(DISTINCT lineitem.l_quantity) AS d FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND customer.c_mktsegment = 'BUILDING'
SELECT COUNT(DISTINCT lineitem.l_quantity) AS d FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND customer.c_mktsegment = 'AUTOMOBILE' GROUP BY lineitem.l_returnflag
SELECT COUNT(DISTINCT orders.o_orderpriority) AS d FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount <= 0.04 GROUP BY lineitem.l_linestatus
SELECT COUNT(DISTINCT lineitem.l_quantity) AS d FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND (customer.c_mktsegment = 'BUILDING' OR lineitem.l_quantity < 10)
SELECT COUNT(*) AS cnt, SUM(lineitem.l_extendedprice) AS sp, AVG(lineitem.l_extendedprice) AS ap FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount <= 0.06 GROUP BY customer.c_mktsegment, lineitem.l_returnflag
SELECT COUNT(DISTINCT lineitem.l_quantity) AS d FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND (customer.c_mktsegment = 'BUILDING' OR lineitem.l_quantity < 10)
SELECT COUNT(*) AS cnt FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_quantity < 30 GROUP BY customer.c_mktsegment, orders.o_orderstatus HAVING cnt >= 500
SELECT AVG(lineitem.l_extendedprice) AS ap FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND (customer.c_mktsegment = 'BUILDING' OR lineitem.l_quantity < 10) GROUP BY lineitem.l_returnflag
