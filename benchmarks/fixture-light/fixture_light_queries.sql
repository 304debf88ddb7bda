SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_size >= 20
SELECT COUNT(*) FROM orders WHERE orders.o_orderstatus = 'P'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_size < 18 AND part.p_size >= 7 AND part.p_type = 'STANDARD'
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_returnflag = 'A'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_returnflag = 'N' AND lineitem.l_tax <= 0.07 AND part.p_type = 'PROMO'
SELECT COUNT(*) FROM part, lineitem, orders WHERE lineitem.l_partkey = part.p_partkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_quantity >= 26
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderdate >= DATE '1997-02-01'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity > 27 AND lineitem.l_shipdate >= DATE '1997-01-01'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_discount BETWEEN 0.00 AND 0.09 AND lineitem.l_returnflag = 'A'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount BETWEEN 0.04 AND 0.06 AND orders.o_orderdate >= DATE '1997-02-01' AND orders.o_totalprice < 388000
SELECT COUNT(*) FROM part, lineitem, orders WHERE lineitem.l_partkey = part.p_partkey AND orders.o_orderkey = lineitem.l_orderkey AND part.p_type = 'PROMO'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount BETWEEN 0.01 AND 0.07
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_returnflag = 'R' AND lineitem.l_tax <= 0.02 AND part.p_type = 'STANDARD'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_type = 'PROMO'
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_acctbal > 5608 AND orders.o_orderdate >= DATE '2000-09-01'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderdate >= DATE '1995-06-01'
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_mktsegment = 'BUILDING' AND orders.o_orderpriority IN ('1-URGENT', '2-HIGH')
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_discount BETWEEN 0.03 AND 0.08 AND part.p_type = 'LARGE'
SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority IN ('1-URGENT', '2-HIGH') AND orders.o_totalprice < 337000
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_discount BETWEEN 0.04 AND 0.08 AND lineitem.l_quantity <= 13 AND lineitem.l_returnflag = 'N'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity <= 45
SELECT COUNT(*) FROM orders WHERE orders.o_orderdate >= DATE '1998-08-01' AND orders.o_orderdate >= DATE '1999-02-01' AND orders.o_orderpriority IN ('1-URGENT', '2-HIGH')
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_shipdate >= DATE '2000-02-01'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_shipdate >= DATE '1997-06-01' AND part.p_size >= 32 AND part.p_type = 'PROMO'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_discount BETWEEN 0.04 AND 0.05 AND lineitem.l_returnflag = 'R'
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_returnflag = 'A' AND orders.o_orderstatus = 'P' AND orders.o_totalprice < 241000
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount BETWEEN 0.00 AND 0.05 AND orders.o_orderdate >= DATE '1997-04-01'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_shipdate >= DATE '1995-02-01'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_shipdate >= DATE '1995-09-01' AND lineitem.l_shipdate >= DATE '1996-03-01'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_quantity >= 18 AND lineitem.l_returnflag = 'A'
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_discount BETWEEN 0.04 AND 0.08 AND lineitem.l_shipdate >= DATE '2000-06-01' AND orders.o_totalprice > 254000
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_discount BETWEEN 0.00 AND 0.07
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity < 45 AND lineitem.l_quantity <= 9 AND lineitem.l_shipdate >= DATE '1996-04-01'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity <= 22 AND lineitem.l_tax <= 0.04
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_tax <= 0.08
SELECT COUNT(*) FROM orders WHERE orders.o_orderdate >= DATE '1996-02-01' AND orders.o_orderstatus = 'P'
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderdate >= DATE '1995-02-01' AND orders.o_totalprice > 289000
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_discount BETWEEN 0.01 AND 0.06 AND lineitem.l_returnflag = 'A'
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderstatus = 'O'
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_mktsegment = 'HOUSEHOLD'
SELECT COUNT(*) FROM supplier, lineitem WHERE lineitem.l_suppkey = supplier.s_suppkey AND supplier.s_acctbal > 5000
SELECT COUNT(*) FROM supplier, lineitem, orders WHERE lineitem.l_suppkey = supplier.s_suppkey AND orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderstatus = 'F' AND supplier.s_acctbal < 3000
SELECT COUNT(*) FROM supplier, nation WHERE supplier.s_nationkey = nation.n_nationkey AND nation.n_name = 'NATION_3'
SELECT COUNT(*) FROM supplier, nation, region WHERE supplier.s_nationkey = nation.n_nationkey AND nation.n_regionkey = region.r_regionkey AND region.r_name = 'ASIA'
SELECT COUNT(*) FROM customer, nation WHERE customer.c_nationkey = nation.n_nationkey AND nation.n_name = 'NATION_7'
SELECT COUNT(*) FROM customer, nation, region WHERE customer.c_nationkey = nation.n_nationkey AND nation.n_regionkey = region.r_regionkey AND region.r_name = 'EUROPE' AND customer.c_acctbal > 0
SELECT COUNT(*) FROM customer, orders, lineitem, part WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_partkey = part.p_partkey AND part.p_type = 'PROMO'
SELECT COUNT(*) FROM customer, orders, lineitem, part WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND lineitem.l_partkey = part.p_partkey AND customer.c_mktsegment = 'BUILDING' AND part.p_size >= 25
SELECT COUNT(*) FROM supplier, lineitem, part WHERE lineitem.l_suppkey = supplier.s_suppkey AND lineitem.l_partkey = part.p_partkey AND part.p_type = 'ECONOMY' AND supplier.s_acctbal >= 0
SELECT COUNT(*) FROM region, nation, customer, orders, lineitem WHERE nation.n_regionkey = region.r_regionkey AND customer.c_nationkey = nation.n_nationkey AND orders.o_custkey = customer.c_custkey AND lineitem.l_orderkey = orders.o_orderkey AND region.r_name = 'AMERICA' AND lineitem.l_quantity < 10
SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority IN ('1-URGENT', '2-HIGH')
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderpriority IN ('5-LOW', '4-NOT SPECIFIED') AND lineitem.l_returnflag = 'R'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND lineitem.l_discount <= 0.05
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_linestatus <> 'F' AND lineitem.l_tax < 0.05
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_mktsegment <> 'BUILDING' AND orders.o_totalprice > 200000
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31' AND lineitem.l_quantity BETWEEN 10 AND 20
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderdate < DATE '1995-06-01' AND lineitem.l_shipdate >= DATE '1995-06-01'
SELECT COUNT(*) FROM orders WHERE orders.o_totalprice BETWEEN 100000 AND 150000 AND orders.o_orderstatus = 'O'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_returnflag IS NOT NULL AND lineitem.l_extendedprice > 40000
SELECT COUNT(*) FROM part WHERE part.p_size >= 10 AND part.p_size < 40 AND part.p_retailprice > 950
SELECT COUNT(*) FROM customer WHERE customer.c_acctbal BETWEEN -500 AND 3000 AND customer.c_mktsegment = 'MACHINERY'
SELECT COUNT(*) FROM supplier WHERE supplier.s_acctbal < 0
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_retailprice >= 980 AND lineitem.l_quantity >= 40 AND lineitem.l_discount >= 0.05
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_acctbal < 0 AND orders.o_orderpriority = '1-URGENT'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderpriority = '3-MEDIUM' AND lineitem.l_linestatus = 'O' AND lineitem.l_discount > 0.02
SELECT COUNT(*) FROM supplier, lineitem, orders WHERE lineitem.l_suppkey = supplier.s_suppkey AND orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderdate >= DATE '1998-01-01' AND lineitem.l_tax >= 0.04
SELECT COUNT(*) FROM part, supplier, lineitem, orders WHERE lineitem.l_partkey = part.p_partkey AND lineitem.l_suppkey = supplier.s_suppkey AND orders.o_orderkey = lineitem.l_orderkey AND part.p_type = 'LARGE' AND supplier.s_acctbal > 2000 AND orders.o_orderstatus = 'O'
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity = 1 AND lineitem.l_returnflag = 'N'
SELECT COUNT(*) FROM orders, lineitem, customer WHERE orders.o_orderkey = lineitem.l_orderkey AND customer.c_custkey = orders.o_custkey AND customer.c_acctbal >= 9000 AND lineitem.l_discount = 0.00
SELECT COUNT(*) FROM nation, customer, orders WHERE customer.c_nationkey = nation.n_nationkey AND orders.o_custkey = customer.c_custkey AND nation.n_name <> 'NATION_0' AND orders.o_totalprice >= 300000
SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_quantity < 5 OR lineitem.l_quantity > 45)
SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_returnflag = 'A' OR lineitem.l_returnflag = 'R') AND lineitem.l_discount <= 0.05
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND (lineitem.l_quantity BETWEEN 1 AND 5 OR lineitem.l_quantity BETWEEN 40 AND 50)
SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND (orders.o_totalprice > 200000 OR lineitem.l_quantity > 45)
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND (customer.c_mktsegment = 'BUILDING' OR orders.o_orderstatus = 'P')
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_returnflag NOT IN ('A', 'R')
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity NOT BETWEEN 5 AND 45
SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority LIKE '%URGENT%'
SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority NOT LIKE '1-%'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND orders.o_orderpriority NOT LIKE '1-%' AND lineitem.l_quantity NOT BETWEEN 5 AND 45
SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_quantity < 5 AND lineitem.l_discount <= 0.05)
SELECT COUNT(*) FROM events WHERE events.value <= 50
SELECT COUNT(*) FROM events WHERE events.event_type = 'click' AND events.value > 20
SELECT COUNT(*) FROM events WHERE events.event_type IN ('view', 'signup')
SELECT COUNT(*) FROM events WHERE events.ts >= DATE '2024-01-15'
SELECT COUNT(*) FROM events WHERE events.value BETWEEN 10 AND 30 AND events.event_type <> 'error'
SELECT COUNT(*) FROM events, customer WHERE events.user_id = customer.c_custkey AND customer.c_mktsegment = 'BUILDING'
SELECT COUNT(*) FROM events, customer WHERE events.user_id = customer.c_custkey AND events.event_type = 'purchase' AND customer.c_acctbal > 5000
SELECT COUNT(*) FROM events, customer, nation WHERE events.user_id = customer.c_custkey AND customer.c_nationkey = nation.n_nationkey AND nation.n_name = 'NATION_19'
SELECT COUNT(*) FROM events WHERE events.ts BETWEEN DATE '2024-01-05' AND DATE '2024-01-10' AND events.value < 100
SELECT COUNT(*) FROM events, customer WHERE events.user_id = customer.c_custkey AND (events.event_type = 'click' OR events.event_type = 'view')
SELECT COUNT(*) FROM part WHERE part.p_brand LIKE 'Brand#1%'
SELECT COUNT(*) FROM part WHERE part.p_type NOT LIKE 'S%'
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND part.p_brand LIKE 'Brand#2%' AND lineitem.l_quantity < 20
SELECT COUNT(*) FROM part WHERE (part.p_size < 5 OR part.p_size > 45)
SELECT COUNT(*) FROM part WHERE (part.p_type = 'STANDARD' OR part.p_type = 'PROMO' OR part.p_type = 'ECONOMY')
SELECT COUNT(*) FROM part, lineitem WHERE lineitem.l_partkey = part.p_partkey AND (part.p_size < 10 OR lineitem.l_discount > 0.07)
SELECT COUNT(*) FROM orders WHERE (orders.o_orderpriority LIKE '1-%' OR orders.o_orderpriority LIKE '2-%')
SELECT COUNT(*) FROM orders WHERE orders.o_orderstatus IN ('O', 'P') AND orders.o_totalprice NOT BETWEEN 50000 AND 250000
SELECT COUNT(*) FROM customer WHERE customer.c_mktsegment NOT IN ('BUILDING', 'MACHINERY') AND customer.c_acctbal > 2500
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND (customer.c_acctbal < 1000 OR orders.o_totalprice > 250000)
SELECT COUNT(*) FROM supplier WHERE supplier.s_acctbal NOT BETWEEN 0 AND 5000
SELECT COUNT(*) FROM supplier, lineitem WHERE lineitem.l_suppkey = supplier.s_suppkey AND (supplier.s_acctbal > 8000 OR lineitem.l_quantity > 45)
SELECT COUNT(*) FROM nation WHERE nation.n_name LIKE 'NATION_1%'
SELECT COUNT(*) FROM nation, customer WHERE customer.c_nationkey = nation.n_nationkey AND nation.n_name NOT LIKE 'NATION_1%'
SELECT COUNT(*) FROM events WHERE (events.event_type = 'click' OR events.event_type = 'view' OR events.event_type = 'signup')
SELECT COUNT(*) FROM events WHERE (events.value < 20 OR events.value > 180)
SELECT COUNT(*) FROM events WHERE (events.event_type = 'purchase' OR events.value > 150)
SELECT COUNT(*) FROM events, customer WHERE events.user_id = customer.c_custkey AND (customer.c_acctbal < 0 OR events.value >= 100)
SELECT COUNT(*) FROM events, customer, nation WHERE events.user_id = customer.c_custkey AND customer.c_nationkey = nation.n_nationkey AND nation.n_name LIKE 'NATION_2%' AND events.event_type <> 'error'
SELECT COUNT(*) FROM events WHERE events.ts NOT BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
SELECT COUNT(*) FROM orders, lineitem WHERE orders.o_orderkey = lineitem.l_orderkey AND (orders.o_orderstatus = 'F' OR orders.o_orderstatus = 'P') AND lineitem.l_returnflag <> 'N'
SELECT COUNT(*) FROM customer, orders, lineitem WHERE customer.c_custkey = orders.o_custkey AND orders.o_orderkey = lineitem.l_orderkey AND (customer.c_mktsegment = 'AUTOMOBILE' OR lineitem.l_quantity < 5)
SELECT COUNT(*) FROM part, lineitem, orders WHERE lineitem.l_partkey = part.p_partkey AND orders.o_orderkey = lineitem.l_orderkey AND part.p_type LIKE 'M%' AND orders.o_totalprice > 150000
SELECT COUNT(*) FROM region, nation, customer WHERE nation.n_regionkey = region.r_regionkey AND customer.c_nationkey = nation.n_nationkey AND region.r_name <> 'AFRICA'
SELECT COUNT(*) FROM region, nation, supplier WHERE nation.n_regionkey = region.r_regionkey AND supplier.s_nationkey = nation.n_nationkey AND (supplier.s_acctbal < 2000 OR supplier.s_acctbal > 8000)
SELECT COUNT(*) FROM lineitem WHERE lineitem.l_returnflag NOT LIKE 'N%'
SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') AND orders.o_orderstatus <> 'O'
SELECT COUNT(*) FROM events, customer WHERE events.user_id = customer.c_custkey AND customer.c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND (events.value < 50 OR events.value > 150)
SELECT COUNT(*) FROM customer, orders WHERE customer.c_custkey = orders.o_custkey AND customer.c_mktsegment LIKE 'B%' AND orders.o_orderpriority LIKE '%HIGH%'
SELECT COUNT(*) FROM part, lineitem, orders, customer WHERE lineitem.l_partkey = part.p_partkey AND orders.o_orderkey = lineitem.l_orderkey AND customer.c_custkey = orders.o_custkey AND (part.p_size > 40 OR customer.c_acctbal < 500)
SELECT COUNT(*) FROM customer WHERE customer.c_mktsegment <> 'NO_SUCH_SEGMENT' AND customer.c_acctbal >= 0
