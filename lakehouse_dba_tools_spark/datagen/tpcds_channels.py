"""TPC-DS catalog/web channel + inventory generators.

Completes the 24-table TPC-DS warehouse the reference materializes
(`resources/TPC-datagen-notebook.scala:361-371,1818-1827` pipes dsdgen
for every table; the schema catalog at 928-1272 declares them all):
together with ``datagen/tpcds.py`` every spec table can now be
generated natively — same construction as the rest of the tier, every
column a deterministic function of the row id (or, for the derived
returns facts, of the originating sale's content), conformed to
``schemas.TPCDS_SCHEMAS``.

Scale notes: the two new sales facts and inventory are embarrassingly
parallel projections over ``spark.range`` (no shuffle, no driver
state); returns derive from their sales fact by a content-hash filter
exactly like ``gen_store_returns``. Dimension sizes follow the spec's
scale-independent sizes (ship_mode 20, call_center 6, warehouse 5,
web_site 30, web_page 60) or are parameterized where the spec scales
them (catalog_page).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_dba_tools_spark.datagen.tpcds import (
    CA_CITIES,
    CD_ROWS,
    HD_ROWS,
    JULIAN_1998_01_01,
    R_REASONS,
    S_STATES,
    _mod,
    _modh,
    _pick,
    _u,
    _uh,
    conform,
)

W_NAMES = ["Conventional childr", "Important issues liv", "Doors canno", "Bad cards must make", "Rooms cook"]


def gen_warehouse(spark: SparkSession, n_rows: int = 5, seed: int = 100) -> DataFrame:
    """warehouse: spec sf1 size is 5 rows; sk domain 1..n matches the
    sales facts' *_warehouse_sk."""
    base = spark.range(0, n_rows, 1, 1)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("w_warehouse_sk"),
        F.lpad(F.concat(F.lit("W"), sk.cast("string")), 16, "0").alias("w_warehouse_id"),
        F.array(*[F.lit(w) for w in W_NAMES])[(F.col("id") % len(W_NAMES)).cast("int")].alias(
            "w_warehouse_name"
        ),
        (_mod(f"wsq{seed}", 900_000) + 100_000).cast("int").alias("w_warehouse_sq_ft"),
        (_mod(f"wsn{seed}", 900) + 100).cast("string").alias("w_street_number"),
        _pick(f"wst{seed}", ["Main", "Oak", "Park", "First", "Elm"]).alias("w_street_name"),
        _pick(f"wstt{seed}", ["Street", "Avenue", "Blvd", "Road", "Lane"]).alias("w_street_type"),
        F.concat(F.lit("Suite "), (_mod(f"wsu{seed}", 400) + 100).cast("string")).alias(
            "w_suite_number"
        ),
        _pick(f"wc{seed}", CA_CITIES).alias("w_city"),
        _pick(f"wcn{seed}", ["Williamson County", "Walker County", "Ziebach County"]).alias(
            "w_county"
        ),
        F.array(*[F.lit(s) for s in S_STATES])[(F.col("id") % len(S_STATES)).cast("int")].alias(
            "w_state"
        ),
        F.lpad((_mod(f"wz{seed}", 90_000) + 10_000).cast("string"), 5, "0").alias("w_zip"),
        F.lit("United States").alias("w_country"),
        F.lit(-5.00).cast("decimal(5,2)").alias("w_gmt_offset"),
    )
    return conform(out, "warehouse")


# The spec's ship_mode is 20 fixed rows: 5 types × 4 code/carrier tiers.
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY"]
SM_CODES = ["AIR", "SURFACE", "SEA", "MAIL"]
SM_CARRIERS = [
    "UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "TBS", "ZHOU", "PRIVATECARRIER",
    "DIAMOND", "BARIAN", "BOXBUNDLES", "ALLIANCE", "ORIENTAL", "HARMSTORF",
    "LATVIAN", "ZOUROS", "MSC", "GERMA", "RUPEKSA", "GREAT EASTERN",
]


def gen_ship_mode(spark: SparkSession) -> DataFrame:
    """ship_mode: the spec's 20 fixed rows (type × code grid)."""
    base = spark.range(0, 20, 1, 1)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("sm_ship_mode_sk"),
        F.lpad(F.concat(F.lit("SM"), sk.cast("string")), 16, "0").alias("sm_ship_mode_id"),
        F.array(*[F.lit(t) for t in SM_TYPES])[(F.col("id") % 5).cast("int")].alias("sm_type"),
        F.array(*[F.lit(c) for c in SM_CODES])[F.floor(F.col("id") / 5).cast("int")].alias(
            "sm_code"
        ),
        F.array(*[F.lit(c) for c in SM_CARRIERS])[F.col("id").cast("int")].alias("sm_carrier"),
        F.lpad(sk.cast("string"), 20, "0").alias("sm_contract"),
    )
    return conform(out, "ship_mode")


def gen_web_site(spark: SparkSession, n_rows: int = 30, seed: int = 100) -> DataFrame:
    """web_site: full 26-column spec schema (spec sf1 = 30 rows)."""
    base = spark.range(0, n_rows, 1, 1)
    sk = F.col("id") + 1
    open_sk = (JULIAN_1998_01_01 + _mod(f"wso{seed}", 300)).cast("int")
    out = base.select(
        sk.cast("int").alias("web_site_sk"),
        F.lpad(F.concat(F.lit("WS"), sk.cast("string")), 16, "0").alias("web_site_id"),
        F.lit("1997-08-16").cast("date").alias("web_rec_start_date"),
        F.lit(None).cast("date").alias("web_rec_end_date"),
        _pick(f"wsn{seed}", ["site_0", "site_1", "site_2", "site_3", "site_4"]).alias("web_name"),
        open_sk.alias("web_open_date_sk"),
        F.lit(None).cast("int").alias("web_close_date_sk"),
        _pick(f"wscl{seed}", ["Unknown"]).alias("web_class"),
        F.concat(F.lit("Manager "), sk.cast("string")).alias("web_manager"),
        (_mod(f"wsm{seed}", 6) + 1).cast("int").alias("web_mkt_id"),
        _pick(f"wsmc{seed}", ["Unknown"]).alias("web_mkt_class"),
        _pick(f"wsmd{seed}", ["Unknown"]).alias("web_mkt_desc"),
        F.concat(F.lit("Market Manager "), sk.cast("string")).alias("web_market_manager"),
        (_mod(f"wsco{seed}", 6) + 1).cast("int").alias("web_company_id"),
        _pick(f"wscn{seed}", ["pri", "able", "ought", "ese", "anti", "cally"]).alias(
            "web_company_name"
        ),
        (_mod(f"wssn{seed}", 900) + 100).cast("string").alias("web_street_number"),
        _pick(f"wsst{seed}", ["Main", "Oak", "Park", "First", "Elm"]).alias("web_street_name"),
        _pick(f"wsstt{seed}", ["Street", "Avenue", "Blvd", "Road", "Lane"]).alias(
            "web_street_type"
        ),
        F.concat(F.lit("Suite "), (_mod(f"wssu{seed}", 400) + 100).cast("string")).alias(
            "web_suite_number"
        ),
        _pick(f"wsc{seed}", CA_CITIES).alias("web_city"),
        _pick(f"wscnt{seed}", ["Williamson County", "Walker County", "Ziebach County"]).alias(
            "web_county"
        ),
        F.array(*[F.lit(s) for s in S_STATES])[(F.col("id") % len(S_STATES)).cast("int")].alias(
            "web_state"
        ),
        F.lpad((_mod(f"wsz{seed}", 90_000) + 10_000).cast("string"), 5, "0").alias("web_zip"),
        F.lit("United States").alias("web_country"),
        F.lit(-5.00).cast("decimal(5,2)").alias("web_gmt_offset"),
        F.round(_u(f"wstx{seed}") * F.lit(0.11), 2).cast("decimal(5,2)").alias(
            "web_tax_percentage"
        ),
    )
    return conform(out, "web_site")


def gen_web_page(spark: SparkSession, n_rows: int = 60, seed: int = 100) -> DataFrame:
    """web_page: full 14-column spec schema (spec sf1 = 60 rows);
    wp_char_count is the column the q90-family filters on."""
    base = spark.range(0, n_rows, 1, 1)
    sk = F.col("id") + 1
    creation = (JULIAN_1998_01_01 + _mod(f"wpc{seed}", 300)).cast("int")
    out = base.select(
        sk.cast("int").alias("wp_web_page_sk"),
        F.lpad(F.concat(F.lit("WP"), sk.cast("string")), 16, "0").alias("wp_web_page_id"),
        F.lit("1997-09-03").cast("date").alias("wp_rec_start_date"),
        F.lit(None).cast("date").alias("wp_rec_end_date"),
        creation.alias("wp_creation_date_sk"),
        (creation + _mod(f"wpa{seed}", 100).cast("int")).alias("wp_access_date_sk"),
        F.when(_mod(f"wpf{seed}", 2) == 0, "0").otherwise("1").alias("wp_autogen_flag"),
        F.lit(None).cast("int").alias("wp_customer_sk"),
        F.concat(F.lit("http://www.example.com/page_"), sk.cast("string")).alias("wp_url"),
        _pick(f"wpt{seed}", ["ad", "bio", "feedback", "general", "order", "welcome", "protected", "dynamic"]).alias("wp_type"),
        (_mod(f"wpcc{seed}", 7_000) + 100).cast("int").alias("wp_char_count"),
        (_mod(f"wplc{seed}", 25) + 2).cast("int").alias("wp_link_count"),
        (_mod(f"wpic{seed}", 7) + 1).cast("int").alias("wp_image_count"),
        (_mod(f"wpmx{seed}", 4) + 1).cast("int").alias("wp_max_ad_count"),
    )
    return conform(out, "web_page")


def gen_call_center(spark: SparkSession, n_rows: int = 6, seed: int = 100) -> DataFrame:
    """call_center: full 31-column spec schema (spec sf1 = 6 rows)."""
    base = spark.range(0, n_rows, 1, 1)
    sk = F.col("id") + 1
    open_sk = (JULIAN_1998_01_01 + _mod(f"cco{seed}", 200)).cast("int")
    out = base.select(
        sk.cast("int").alias("cc_call_center_sk"),
        F.lpad(F.concat(F.lit("CC"), sk.cast("string")), 16, "0").alias("cc_call_center_id"),
        F.lit("1998-01-01").cast("date").alias("cc_rec_start_date"),
        F.lit(None).cast("date").alias("cc_rec_end_date"),
        F.lit(None).cast("int").alias("cc_closed_date_sk"),
        open_sk.alias("cc_open_date_sk"),
        _pick(f"ccn{seed}", ["NY Metro", "Mid Atlantic", "Pacific NW", "North Midwest", "California", "Hawaii/Alaska"]).alias("cc_name"),
        _pick(f"cccl{seed}", ["small", "medium", "large"]).alias("cc_class"),
        (_mod(f"cce{seed}", 600) + 50).cast("int").alias("cc_employees"),
        (_mod(f"ccsq{seed}", 2_000_000) + 500_000).cast("int").alias("cc_sq_ft"),
        F.lit("8AM-8PM").alias("cc_hours"),
        F.concat(F.lit("Manager "), sk.cast("string")).alias("cc_manager"),
        (_mod(f"ccm{seed}", 6) + 1).cast("int").alias("cc_mkt_id"),
        _pick(f"ccmc{seed}", ["Unknown"]).alias("cc_mkt_class"),
        _pick(f"ccmd{seed}", ["Unknown"]).alias("cc_mkt_desc"),
        F.concat(F.lit("Market Manager "), sk.cast("string")).alias("cc_market_manager"),
        (_mod(f"ccd{seed}", 2) + 1).cast("int").alias("cc_division"),
        _pick(f"ccdn{seed}", ["pri", "able"]).alias("cc_division_name"),
        (_mod(f"ccc{seed}", 6) + 1).cast("int").alias("cc_company"),
        _pick(f"cccn{seed}", ["pri", "able", "ought", "ese", "anti", "cally"]).alias(
            "cc_company_name"
        ),
        (_mod(f"ccsn{seed}", 900) + 100).cast("string").alias("cc_street_number"),
        _pick(f"ccst{seed}", ["Main", "Oak", "Park", "First", "Elm"]).alias("cc_street_name"),
        _pick(f"ccstt{seed}", ["Street", "Avenue", "Blvd", "Road", "Lane"]).alias(
            "cc_street_type"
        ),
        F.concat(F.lit("Suite "), (_mod(f"ccsu{seed}", 400) + 100).cast("string")).alias(
            "cc_suite_number"
        ),
        _pick(f"ccct{seed}", CA_CITIES).alias("cc_city"),
        _pick(f"cccn2{seed}", ["Williamson County", "Walker County", "Ziebach County"]).alias(
            "cc_county"
        ),
        F.array(*[F.lit(s) for s in S_STATES])[(F.col("id") % len(S_STATES)).cast("int")].alias(
            "cc_state"
        ),
        F.lpad((_mod(f"ccz{seed}", 90_000) + 10_000).cast("string"), 5, "0").alias("cc_zip"),
        F.lit("United States").alias("cc_country"),
        F.lit(-5.00).cast("decimal(5,2)").alias("cc_gmt_offset"),
        F.round(_u(f"cctx{seed}") * F.lit(0.11), 2).cast("decimal(5,2)").alias(
            "cc_tax_percentage"
        ),
    )
    return conform(out, "call_center")


def gen_catalog_page(spark: SparkSession, n_rows: int = 11_718, seed: int = 100, partitions: int | None = None) -> DataFrame:
    """catalog_page: full 9-column spec schema (spec sf1 = 11,718)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1
    start = (JULIAN_1998_01_01 + _mod(f"cps{seed}", 600)).cast("int")
    out = base.select(
        sk.cast("int").alias("cp_catalog_page_sk"),
        F.lpad(F.concat(F.lit("CP"), sk.cast("string")), 16, "0").alias("cp_catalog_page_id"),
        start.alias("cp_start_date_sk"),
        (start + _mod(f"cpe{seed}", 90).cast("int") + 10).alias("cp_end_date_sk"),
        _pick(f"cpd{seed}", ["DEPARTMENT"]).alias("cp_department"),
        (F.floor(F.col("id") / 108) + 1).cast("int").alias("cp_catalog_number"),
        (F.col("id") % 108 + 1).cast("int").alias("cp_catalog_page_number"),
        F.concat(F.lit("Catalog page "), sk.cast("string")).alias("cp_description"),
        _pick(f"cpt{seed}", ["bi-annual", "quarterly", "monthly"]).alias("cp_type"),
    )
    return conform(out, "catalog_page")


def _money_cols(prefix: str, seed: int, ship_seed_tag: str) -> dict[str, Column]:
    """The shared sales-fact money algebra (spec identities, exact
    decimal): same construction as gen_store_sales, plus the catalog/web
    shipping tier (ext_ship_cost and the net_paid_inc_* ladder)."""
    price = F.round(_u(f"{prefix}lp{seed}") * 199 + 1, 2).cast("decimal(7,2)")
    qty = ((F.xxhash64("id", F.lit(f"{prefix}q{seed}")) % 100 + 100) % 100 + 1).cast("int")
    discount = F.round(_u(f"{prefix}dc{seed}") * 0.3, 2).cast("decimal(7,2)")
    wholesale = F.round(price * F.lit(0.6), 2).cast("decimal(7,2)")
    sales_price = F.round(price * (1 - discount), 2).cast("decimal(7,2)")
    ext_sales = F.round(price * (1 - discount) * qty, 2).cast("decimal(7,2)")
    ext_list = F.round(price * qty, 2).cast("decimal(7,2)")
    ext_wholesale = F.round(wholesale * qty, 2).cast("decimal(7,2)")
    ext_tax = F.round(ext_sales * F.lit(0.05), 2).cast("decimal(7,2)")
    coupon = (
        F.when(
            (F.xxhash64("id", F.lit(f"{prefix}cp{seed}")) % 10 + 10) % 10 == 0,
            F.round(ext_sales * F.lit(0.1), 2),
        )
        .otherwise(F.lit(0))
        .cast("decimal(7,2)")
    )
    ext_ship = F.round(_u(ship_seed_tag) * 3 * qty, 2).cast("decimal(7,2)")
    net_paid = (ext_sales - coupon).cast("decimal(7,2)")
    return {
        "quantity": qty,
        "wholesale_cost": wholesale,
        "list_price": price,
        "sales_price": sales_price,
        "ext_discount_amt": (ext_list - ext_sales).cast("decimal(7,2)"),
        "ext_sales_price": ext_sales,
        "ext_wholesale_cost": ext_wholesale,
        "ext_list_price": ext_list,
        "ext_tax": ext_tax,
        "coupon_amt": coupon,
        "ext_ship_cost": ext_ship,
        "net_paid": net_paid,
        "net_paid_inc_tax": (net_paid + ext_tax).cast("decimal(7,2)"),
        "net_paid_inc_ship": (net_paid + ext_ship).cast("decimal(7,2)"),
        "net_paid_inc_ship_tax": (net_paid + ext_ship + ext_tax).cast("decimal(7,2)"),
        "net_profit": (net_paid - ext_wholesale).cast("decimal(7,2)"),
    }


def gen_catalog_sales(
    spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """catalog_sales: the spec's widest fact (34 columns). FK domains
    line up with every dimension generator; bill/ship customer legs are
    independently hashed (the q16-family's bill≠ship predicates have
    both outcomes). Orders average ~4 line items (cs_order_number =
    id/4), giving the per-order shapes (q16 distinct-order counts)
    multi-row groups."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    m = _money_cols("cs", seed, f"cssh{seed}")
    sold = ((F.xxhash64("id", F.lit(f"csd{seed}")) % 730 + 730) % 730 + JULIAN_1998_01_01).cast("int")

    def fk(tag: str, n: int) -> Column:
        return (_mod(f"cs{tag}{seed}", n) + 1).cast("int")

    out = base.select(
        sold.alias("cs_sold_date_sk"),
        _mod(f"cst{seed}", 86_400).cast("int").alias("cs_sold_time_sk"),
        (sold + _mod(f"cssd{seed}", 120).cast("int") + 2).alias("cs_ship_date_sk"),
        fk("bc", 50_000).alias("cs_bill_customer_sk"),
        fk("bcd", CD_ROWS).alias("cs_bill_cdemo_sk"),
        fk("bhd", HD_ROWS).alias("cs_bill_hdemo_sk"),
        fk("bad", 50_000).alias("cs_bill_addr_sk"),
        fk("sc", 50_000).alias("cs_ship_customer_sk"),
        fk("scd", CD_ROWS).alias("cs_ship_cdemo_sk"),
        fk("shd", HD_ROWS).alias("cs_ship_hdemo_sk"),
        fk("sad", 50_000).alias("cs_ship_addr_sk"),
        fk("cc", 6).alias("cs_call_center_sk"),
        fk("cpg", 11_718).alias("cs_catalog_page_sk"),
        fk("sm", 20).alias("cs_ship_mode_sk"),
        fk("wh", 5).alias("cs_warehouse_sk"),
        fk("it", 18_000).alias("cs_item_sk"),
        fk("pm", 300).alias("cs_promo_sk"),
        (F.col("id") / 4 + 1).cast("bigint").alias("cs_order_number"),
        m["quantity"].alias("cs_quantity"),
        m["wholesale_cost"].alias("cs_wholesale_cost"),
        m["list_price"].alias("cs_list_price"),
        m["sales_price"].alias("cs_sales_price"),
        m["ext_discount_amt"].alias("cs_ext_discount_amt"),
        m["ext_sales_price"].alias("cs_ext_sales_price"),
        m["ext_wholesale_cost"].alias("cs_ext_wholesale_cost"),
        m["ext_list_price"].alias("cs_ext_list_price"),
        m["ext_tax"].alias("cs_ext_tax"),
        m["coupon_amt"].alias("cs_coupon_amt"),
        m["ext_ship_cost"].alias("cs_ext_ship_cost"),
        m["net_paid"].alias("cs_net_paid"),
        m["net_paid_inc_tax"].alias("cs_net_paid_inc_tax"),
        m["net_paid_inc_ship"].alias("cs_net_paid_inc_ship"),
        m["net_paid_inc_ship_tax"].alias("cs_net_paid_inc_ship_tax"),
        m["net_profit"].alias("cs_net_profit"),
    )
    return conform(out, "catalog_sales")


def gen_web_sales(
    spark: SparkSession, n_rows: int, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """web_sales: 34-column spec schema, same money algebra as
    catalog_sales with the web-channel dims (web_site, web_page)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    m = _money_cols("ws", seed, f"wssh{seed}")
    sold = ((F.xxhash64("id", F.lit(f"wsd{seed}")) % 730 + 730) % 730 + JULIAN_1998_01_01).cast("int")

    def fk(tag: str, n: int) -> Column:
        return (_mod(f"ws{tag}{seed}", n) + 1).cast("int")

    out = base.select(
        sold.alias("ws_sold_date_sk"),
        _mod(f"wst{seed}", 86_400).cast("int").alias("ws_sold_time_sk"),
        (sold + _mod(f"wssd{seed}", 120).cast("int") + 2).alias("ws_ship_date_sk"),
        fk("it", 18_000).alias("ws_item_sk"),
        fk("bc", 50_000).alias("ws_bill_customer_sk"),
        fk("bcd", CD_ROWS).alias("ws_bill_cdemo_sk"),
        fk("bhd", HD_ROWS).alias("ws_bill_hdemo_sk"),
        fk("bad", 50_000).alias("ws_bill_addr_sk"),
        fk("sc", 50_000).alias("ws_ship_customer_sk"),
        fk("scd", CD_ROWS).alias("ws_ship_cdemo_sk"),
        fk("shd", HD_ROWS).alias("ws_ship_hdemo_sk"),
        fk("sad", 50_000).alias("ws_ship_addr_sk"),
        fk("wp", 60).alias("ws_web_page_sk"),
        fk("wsi", 30).alias("ws_web_site_sk"),
        fk("sm", 20).alias("ws_ship_mode_sk"),
        fk("wh", 5).alias("ws_warehouse_sk"),
        fk("pm", 300).alias("ws_promo_sk"),
        (F.col("id") / 4 + 1).cast("bigint").alias("ws_order_number"),
        m["quantity"].alias("ws_quantity"),
        m["wholesale_cost"].alias("ws_wholesale_cost"),
        m["list_price"].alias("ws_list_price"),
        m["sales_price"].alias("ws_sales_price"),
        m["ext_discount_amt"].alias("ws_ext_discount_amt"),
        m["ext_sales_price"].alias("ws_ext_sales_price"),
        m["ext_wholesale_cost"].alias("ws_ext_wholesale_cost"),
        m["ext_list_price"].alias("ws_ext_list_price"),
        m["ext_tax"].alias("ws_ext_tax"),
        m["coupon_amt"].alias("ws_coupon_amt"),
        m["ext_ship_cost"].alias("ws_ext_ship_cost"),
        m["net_paid"].alias("ws_net_paid"),
        m["net_paid_inc_tax"].alias("ws_net_paid_inc_tax"),
        m["net_paid_inc_ship"].alias("ws_net_paid_inc_ship"),
        m["net_paid_inc_ship_tax"].alias("ws_net_paid_inc_ship_tax"),
        m["net_profit"].alias("ws_net_profit"),
    )
    return conform(out, "web_sales")


def gen_catalog_returns(
    spark: SparkSession, n_sales: int, seed: int = 100, return_rate: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """catalog_returns: derived content-hashed from gen_catalog_sales
    (same pattern as gen_store_returns — a pure function of the
    originating line, keyed by (order_number, item, sold_date))."""
    cs = gen_catalog_sales(spark, n_sales, seed=seed, partitions=partitions)
    key = [F.col("cs_order_number"), F.col("cs_item_sk"), F.col("cs_sold_date_sk")]
    picked = cs.where(_modh(f"cret{seed}", return_rate, *key) == 0)
    rq = (_modh(f"crq{seed}", 1_000_000, *key) % F.col("cs_quantity") + 1).cast("int")
    amt = F.round(F.col("cs_sales_price") * rq, 2).cast("decimal(7,2)")
    tax = F.round(amt * F.lit(0.05), 2).cast("decimal(7,2)")
    fee = F.round(_uh(f"crf{seed}", *key) * 99 + 1, 2).cast("decimal(7,2)")
    ship = F.round(_uh(f"crs{seed}", *key) * 25, 2).cast("decimal(7,2)")
    refunded = F.round(amt * F.lit(0.5), 2).cast("decimal(7,2)")
    reversed_ = F.round((amt - refunded) * F.lit(0.5), 2).cast("decimal(7,2)")
    out = picked.select(
        (F.col("cs_ship_date_sk") + (_modh(f"crd{seed}", 90, *key) + 1).cast("int"))
        .cast("int")
        .alias("cr_returned_date_sk"),
        _modh(f"crt{seed}", 86_400, *key).cast("int").alias("cr_returned_time_sk"),
        F.col("cs_item_sk").alias("cr_item_sk"),
        F.col("cs_bill_customer_sk").alias("cr_refunded_customer_sk"),
        F.col("cs_bill_cdemo_sk").alias("cr_refunded_cdemo_sk"),
        F.col("cs_bill_hdemo_sk").alias("cr_refunded_hdemo_sk"),
        F.col("cs_bill_addr_sk").alias("cr_refunded_addr_sk"),
        F.col("cs_ship_customer_sk").alias("cr_returning_customer_sk"),
        F.col("cs_ship_cdemo_sk").alias("cr_returning_cdemo_sk"),
        F.col("cs_ship_hdemo_sk").alias("cr_returning_hdemo_sk"),
        F.col("cs_ship_addr_sk").alias("cr_returning_addr_sk"),
        F.col("cs_call_center_sk").alias("cr_call_center_sk"),
        F.col("cs_catalog_page_sk").alias("cr_catalog_page_sk"),
        F.col("cs_ship_mode_sk").alias("cr_ship_mode_sk"),
        F.col("cs_warehouse_sk").alias("cr_warehouse_sk"),
        (_modh(f"crr{seed}", len(R_REASONS), *key) + 1).cast("int").alias("cr_reason_sk"),
        F.col("cs_order_number").alias("cr_order_number"),
        rq.alias("cr_return_quantity"),
        amt.alias("cr_return_amount"),
        tax.alias("cr_return_tax"),
        (amt + tax).cast("decimal(7,2)").alias("cr_return_amt_inc_tax"),
        fee.alias("cr_fee"),
        ship.alias("cr_return_ship_cost"),
        refunded.alias("cr_refunded_cash"),
        reversed_.alias("cr_reversed_charge"),
        (amt - refunded - reversed_).cast("decimal(7,2)").alias("cr_store_credit"),
        (tax + fee + ship).cast("decimal(7,2)").alias("cr_net_loss"),
    )
    return conform(out, "catalog_returns")


def gen_web_returns(
    spark: SparkSession, n_sales: int, seed: int = 100, return_rate: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """web_returns: derived content-hashed from gen_web_sales."""
    ws = gen_web_sales(spark, n_sales, seed=seed, partitions=partitions)
    key = [F.col("ws_order_number"), F.col("ws_item_sk"), F.col("ws_sold_date_sk")]
    picked = ws.where(_modh(f"wret{seed}", return_rate, *key) == 0)
    rq = (_modh(f"wrq{seed}", 1_000_000, *key) % F.col("ws_quantity") + 1).cast("int")
    amt = F.round(F.col("ws_sales_price") * rq, 2).cast("decimal(7,2)")
    tax = F.round(amt * F.lit(0.05), 2).cast("decimal(7,2)")
    fee = F.round(_uh(f"wrf{seed}", *key) * 99 + 1, 2).cast("decimal(7,2)")
    ship = F.round(_uh(f"wrs{seed}", *key) * 25, 2).cast("decimal(7,2)")
    refunded = F.round(amt * F.lit(0.5), 2).cast("decimal(7,2)")
    reversed_ = F.round((amt - refunded) * F.lit(0.5), 2).cast("decimal(7,2)")
    out = picked.select(
        (F.col("ws_ship_date_sk") + (_modh(f"wrd{seed}", 90, *key) + 1).cast("int"))
        .cast("int")
        .alias("wr_returned_date_sk"),
        _modh(f"wrt{seed}", 86_400, *key).cast("int").alias("wr_returned_time_sk"),
        F.col("ws_item_sk").alias("wr_item_sk"),
        F.col("ws_bill_customer_sk").alias("wr_refunded_customer_sk"),
        F.col("ws_bill_cdemo_sk").alias("wr_refunded_cdemo_sk"),
        F.col("ws_bill_hdemo_sk").alias("wr_refunded_hdemo_sk"),
        F.col("ws_bill_addr_sk").alias("wr_refunded_addr_sk"),
        F.col("ws_ship_customer_sk").alias("wr_returning_customer_sk"),
        F.col("ws_ship_cdemo_sk").alias("wr_returning_cdemo_sk"),
        F.col("ws_ship_hdemo_sk").alias("wr_returning_hdemo_sk"),
        F.col("ws_ship_addr_sk").alias("wr_returning_addr_sk"),
        F.col("ws_web_page_sk").alias("wr_web_page_sk"),
        (_modh(f"wrr{seed}", len(R_REASONS), *key) + 1).cast("int").alias("wr_reason_sk"),
        F.col("ws_order_number").alias("wr_order_number"),
        rq.alias("wr_return_quantity"),
        amt.alias("wr_return_amt"),
        tax.alias("wr_return_tax"),
        (amt + tax).cast("decimal(7,2)").alias("wr_return_amt_inc_tax"),
        fee.alias("wr_fee"),
        ship.alias("wr_return_ship_cost"),
        refunded.alias("wr_refunded_cash"),
        reversed_.alias("wr_reversed_charge"),
        (amt - refunded - reversed_).cast("decimal(7,2)").alias("wr_account_credit"),
        (tax + fee + ship).cast("decimal(7,2)").alias("wr_net_loss"),
    )
    return conform(out, "web_returns")


def gen_inventory(
    spark: SparkSession,
    n_items: int = 18_000,
    n_warehouses: int = 5,
    n_weeks: int = 104,
    seed: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """inventory: one row per (weekly date, item, warehouse) — the
    spec's snapshot grid (dsdgen emits every combination). Decoded
    positionally from a single range so the grid is exact and
    shuffle-free; quantity is the only hashed column."""
    parts = partitions or spark.sparkContext.defaultParallelism
    total = n_weeks * n_items * n_warehouses
    base = spark.range(0, total, 1, parts)
    week = F.floor(F.col("id") / (n_items * n_warehouses))
    rem = F.col("id") % (n_items * n_warehouses)
    item = F.floor(rem / n_warehouses) + 1
    wh = rem % n_warehouses + 1
    out = base.select(
        (week * 7 + JULIAN_1998_01_01).cast("int").alias("inv_date_sk"),
        item.cast("int").alias("inv_item_sk"),
        wh.cast("int").alias("inv_warehouse_sk"),
        _mod(f"invq{seed}", 1_000).cast("int").alias("inv_quantity_on_hand"),
    )
    return conform(out, "inventory")
