"""Spark-native TPC-DS table generators (full spec schemas).

The reference materializes TPC-DS tables by piping dsdgen on every
executor (`resources/TPC-datagen-notebook.scala:361-371,1598-1606`) and
declares the 24-table schema catalog up front (same file, 928-1272).
Here each table is a pure projection over ``spark.range(N)`` — every
column a deterministic function of the row id (xxhash64-derived), so
the data is identical for any partitioning, any cluster size, any
retry. That is a stronger determinism guarantee than dsdgen's (which
depends on a fixed child/parallel split) and needs no external binary.

Schema fidelity: every generator emits the full TPC-DS v2 column list
for its table, conformed to ``schemas.TPCDS_SCHEMAS`` — spec order,
spec types (char/varchar carried as Spark strings; Spark's CHAR(n)
write-side padding would add trailing blanks the spec data doesn't
have). ``tests/test_tpcds.py`` pins column-for-column agreement.

Value realism follows the public TPC-DS spec vocabularies (the 10 item
categories, the demographics cross-product domains, the 2450815-based
Julian date surrogate keys) without replicating dsdgen's RNG streams:
queries shaped like the TPC-DS corpus hit the same join keys, domains,
and selectivities, but aggregate values are this generator's own.

Scale: dimensions are either fixed-size (store, promotion,
customer_demographics — the spec's own scale-independent tables) or
parameterized by row count; the store_sales fact scales linearly.
Nothing here shuffles — generation is embarrassingly parallel and the
only memory cost is the projection width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import CharType, StringType, VarcharType

from lakehouse_dba_tools_spark.datagen.schemas import schema_for

_MASK53 = (1 << 53) - 1

# Julian day number of 1998-01-01 — the TPC-DS date_dim surrogate-key
# convention (d_date_sk is the Julian day; 2451545 = 2000-01-01).
JULIAN_1998_01_01 = 2450815
EPOCH_1998 = "1998-01-01"


def _u(seed_tag: str) -> Column:
    """Uniform [0,1) double from xxhash64(id, tag) — partition-independent."""
    h = F.xxhash64(F.col("id"), F.lit(seed_tag))
    return (h.bitwiseAND(F.lit(_MASK53).cast("long"))).cast("double") / float(1 << 53)


def _mod(seed_tag: str, n: int) -> Column:
    """Deterministic integer in [0, n) from the row id."""
    return (F.xxhash64(F.col("id"), F.lit(seed_tag)) % n + n) % n


def _pick(seed_tag: str, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return arr[_mod(seed_tag, len(values)).cast("int")]


def conform(df: DataFrame, table: str) -> DataFrame:
    """Project ``df`` onto the spec schema of ``table``: spec column
    order, spec types (CharType/VarcharType relaxed to string — see
    module docstring). Raises if a spec column is missing, so a
    generator can never silently drop schema surface."""
    fields = schema_for(table).fields
    have = set(df.columns)
    missing = [f.name for f in fields if f.name not in have]
    if missing:
        raise ValueError(f"generator for {table!r} lacks spec columns {missing}")
    cols = []
    for f in fields:
        t = StringType() if isinstance(f.dataType, (CharType, VarcharType)) else f.dataType
        cols.append(F.col(f.name).cast(t).alias(f.name))
    return df.select(*cols)


def gen_date_dim(
    spark: SparkSession, start: str = EPOCH_1998, n_days: int = 1826, partitions: int | None = None
) -> DataFrame:
    """date_dim: one row per calendar day, every column pure date
    algebra (no hashing needed — the spec table IS deterministic).
    Default span 1998-2002 (the dsdgen window store_sales keys into).

    d_date_sk follows the spec's Julian-day convention so generated
    fact date keys (gen_store_sales: 2450815 + days) join directly.
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_days, 1, parts)
    base_julian = JULIAN_1998_01_01 + _days_since_1998(start)
    d = F.date_add(F.lit(start).cast("date"), F.col("id").cast("int"))
    sk = (F.col("id") + base_julian).cast("int")

    def holiday(col: Column) -> Column:
        return (
            F.when(
                ((F.month(col) == 12) & (F.dayofmonth(col) == 25))
                | ((F.month(col) == 1) & (F.dayofmonth(col) == 1))
                | ((F.month(col) == 7) & (F.dayofmonth(col) == 4)),
                "Y",
            ).otherwise("N")
        )

    month_seq = (F.year(d) - 1900) * 12 + F.month(d) - 1
    week_seq = F.floor(F.datediff(d, F.lit("1900-01-01").cast("date")) / 7).cast("int")
    quarter_seq = (F.year(d) - 1900) * 4 + F.quarter(d) - 1
    out = base.select(
        sk.alias("d_date_sk"),
        F.lpad(F.concat(F.lit("D"), sk.cast("string")), 16, "0").alias("d_date_id"),
        d.alias("d_date"),
        month_seq.cast("int").alias("d_month_seq"),
        week_seq.alias("d_week_seq"),
        quarter_seq.cast("int").alias("d_quarter_seq"),
        F.year(d).cast("int").alias("d_year"),
        (F.dayofweek(d) - 1).cast("int").alias("d_dow"),
        F.month(d).cast("int").alias("d_moy"),
        F.dayofmonth(d).cast("int").alias("d_dom"),
        F.quarter(d).cast("int").alias("d_qoy"),
        F.year(d).cast("int").alias("d_fy_year"),
        quarter_seq.cast("int").alias("d_fy_quarter_seq"),
        week_seq.alias("d_fy_week_seq"),
        F.date_format(d, "EEEE").alias("d_day_name"),
        F.concat(F.year(d).cast("string"), F.lit("Q"), F.quarter(d).cast("string")).alias(
            "d_quarter_name"
        ),
        holiday(d).alias("d_holiday"),
        F.when(F.dayofweek(d).isin(1, 7), "Y").otherwise("N").alias("d_weekend"),
        holiday(F.date_add(d, 1)).alias("d_following_holiday"),
        (sk - F.dayofmonth(d) + 1).cast("int").alias("d_first_dom"),
        (sk + F.datediff(F.last_day(d), d)).cast("int").alias("d_last_dom"),
        (sk - 365).cast("int").alias("d_same_day_ly"),
        (sk - 91).cast("int").alias("d_same_day_lq"),
        F.lit("N").alias("d_current_day"),
        F.lit("N").alias("d_current_week"),
        F.lit("N").alias("d_current_month"),
        F.lit("N").alias("d_current_quarter"),
        F.lit("N").alias("d_current_year"),
    )
    return conform(out, "date_dim")


def _days_since_1998(start: str) -> int:
    import datetime as _dt

    return (_dt.date.fromisoformat(start) - _dt.date(1998, 1, 1)).days


# Public TPC-DS spec vocabularies (dsdgen's own domains).
I_CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]
I_CLASSES = [
    "accent", "bedding", "blinds/shades", "bracelets", "classical",
    "computers", "decor", "dresses", "fiction", "fitness",
    "flatware", "glassware", "infants", "kids", "mens watch",
    "pants",
]
I_SIZES = ["small", "medium", "large", "extra large", "economy", "N/A", "petite"]
I_COLORS = [
    "almond", "azure", "beige", "black", "blue", "brown", "coral",
    "cream", "cyan", "gold", "green", "indigo", "ivory", "khaki",
]
I_UNITS = ["Each", "Dozen", "Case", "Pound", "Oz", "Gram", "Ton", "Box", "Bunch", "Unknown"]


def gen_item(
    spark: SparkSession, n_rows: int = 18_000, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """item: full 22-column spec schema. Brand/class/category ids nest
    the way dsdgen's do (brand within manufacturer within category) so
    the q3/q42/q52-family rollups group realistically."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1
    category_id = (_mod(f"icat{seed}", 10) + 1).cast("int")
    class_id = (_mod(f"icls{seed}", 16) + 1).cast("int")
    manufact_id = (_mod(f"imfg{seed}", 100) + 1).cast("int")
    brand_in_mfg = (_mod(f"ibrd{seed}", 10) + 1).cast("int")
    brand_id = (manufact_id * 100 + brand_in_mfg).cast("int")
    price = F.round(_u(f"iprc{seed}") * 99 + 1, 2).cast("decimal(7,2)")
    out = base.select(
        sk.cast("int").alias("i_item_sk"),
        F.lpad(F.concat(F.lit("I"), sk.cast("string")), 16, "0").alias("i_item_id"),
        F.lit("1997-10-27").cast("date").alias("i_rec_start_date"),
        F.lit(None).cast("date").alias("i_rec_end_date"),
        F.concat_ws(
            " ",
            _pick(f"id1{seed}", ["Durable", "Popular", "Compact", "Classic", "Premium"]),
            _pick(f"id2{seed}", ["everyday", "seasonal", "imported", "handmade", "certified"]),
            _pick(f"id3{seed}", ["goods", "supplies", "essentials", "wares", "items"]),
        ).alias("i_item_desc"),
        price.alias("i_current_price"),
        F.round(price * F.lit(0.6), 2).cast("decimal(7,2)").alias("i_wholesale_cost"),
        brand_id.alias("i_brand_id"),
        F.concat(F.lit("Brand#"), manufact_id.cast("string"), F.lit("-"), brand_in_mfg.cast("string")).alias("i_brand"),
        class_id.alias("i_class_id"),
        I_CLASSES_COL(class_id).alias("i_class"),
        category_id.alias("i_category_id"),
        I_CATEGORIES_COL(category_id).alias("i_category"),
        manufact_id.alias("i_manufact_id"),
        F.concat(F.lit("Manufacturer#"), manufact_id.cast("string")).alias("i_manufact"),
        _pick(f"isz{seed}", I_SIZES).alias("i_size"),
        F.lpad(F.conv(F.abs(F.xxhash64("id", F.lit(f"ifm{seed}"))).cast("string"), 10, 16), 20, "0").alias("i_formulation"),
        _pick(f"icl{seed}", I_COLORS).alias("i_color"),
        _pick(f"iun{seed}", I_UNITS).alias("i_units"),
        F.lit("Unknown").alias("i_container"),
        (_mod(f"imgr{seed}", 100) + 1).cast("int").alias("i_manager_id"),
        F.concat(F.lit("Product "), F.lpad(sk.cast("string"), 8, "0")).alias("i_product_name"),
    )
    return conform(out, "item")


def I_CATEGORIES_COL(category_id: Column) -> Column:
    return F.array(*[F.lit(c) for c in I_CATEGORIES])[(category_id - 1).cast("int")]


def I_CLASSES_COL(class_id: Column) -> Column:
    return F.array(*[F.lit(c) for c in I_CLASSES])[(class_id - 1).cast("int")]


S_STATES = ["TN", "OH", "TX", "GA", "MI", "IL", "NC", "FL"]


def gen_store(
    spark: SparkSession, n_rows: int = 8, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """store: full 29-column spec schema; default 8 stores to match
    gen_store_sales' ss_store_sk domain."""
    parts = partitions or min(n_rows, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("s_store_sk"),
        F.lpad(F.concat(F.lit("S"), sk.cast("string")), 16, "0").alias("s_store_id"),
        F.lit("1997-03-13").cast("date").alias("s_rec_start_date"),
        F.lit(None).cast("date").alias("s_rec_end_date"),
        F.lit(None).cast("int").alias("s_closed_date_sk"),
        _pick(f"snm{seed}", ["ought", "able", "pri", "ese", "anti", "cally", "ation", "eing"]).alias("s_store_name"),
        (_mod(f"semp{seed}", 100) + 200).cast("int").alias("s_number_employees"),
        (_mod(f"sfl{seed}", 4_000_000) + 5_000_000).cast("int").alias("s_floor_space"),
        F.lit("8AM-10PM").alias("s_hours"),
        F.concat(F.lit("Manager "), sk.cast("string")).alias("s_manager"),
        (_mod(f"smk{seed}", 10) + 1).cast("int").alias("s_market_id"),
        F.lit("Unknown").alias("s_geography_class"),
        F.lit("Unknown").alias("s_market_desc"),
        F.concat(F.lit("Market Manager "), sk.cast("string")).alias("s_market_manager"),
        (_mod(f"sdv{seed}", 2) + 1).cast("int").alias("s_division_id"),
        F.lit("Unknown").alias("s_division_name"),
        F.lit(1).cast("int").alias("s_company_id"),
        F.lit("Unknown").alias("s_company_name"),
        (_mod(f"sst{seed}", 900) + 100).cast("string").alias("s_street_number"),
        _pick(f"ssn{seed}", ["Main", "Oak", "Park", "First", "Elm"]).alias("s_street_name"),
        _pick(f"sstt{seed}", ["Street", "Avenue", "Blvd", "Road", "Lane"]).alias("s_street_type"),
        F.concat(F.lit("Suite "), (_mod(f"ssu{seed}", 400) + 100).cast("string")).alias("s_suite_number"),
        _pick(f"scty{seed}", ["Midway", "Fairview", "Oak Grove", "Riverside", "Centerville"]).alias("s_city"),
        _pick(f"scnty{seed}", ["Williamson County", "Walker County", "Ziebach County"]).alias("s_county"),
        F.array(*[F.lit(s) for s in S_STATES])[(sk.cast("int") - 1) % len(S_STATES)].alias("s_state"),
        F.lpad((_mod(f"szip{seed}", 90000) + 10000).cast("string"), 5, "0").alias("s_zip"),
        F.lit("United States").alias("s_country"),
        F.lit(-5.00).cast("decimal(5,2)").alias("s_gmt_offset"),
        F.round(_u(f"stax{seed}") * F.lit(0.11), 2).cast("decimal(5,2)").alias("s_tax_precentage"),
    )
    return conform(out, "store")


# Public TPC-DS customer_demographics domains — the table is the FULL
# cross product of these (1,920,800 rows at every scale factor).
CD_GENDERS = ["M", "F"]
CD_MARITAL = ["M", "S", "D", "W", "U"]
CD_EDUCATION = [
    "Primary", "Secondary", "College", "2 yr Degree",
    "4 yr Degree", "Advanced Degree", "Unknown",
]
CD_CREDIT = ["Low Risk", "High Risk", "Good", "Unknown"]
CD_ROWS = 2 * 5 * 7 * 20 * 4 * 7 * 7 * 7  # 1,920,800


def gen_customer_demographics(spark: SparkSession, partitions: int | None = None) -> DataFrame:
    """customer_demographics: the spec's exact cross-product table,
    decoded positionally from the surrogate key (gender varies fastest,
    matching dsdgen's nesting) — no randomness at all, so any engine
    regenerating this table gets identical rows."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, CD_ROWS, 1, parts)
    x0 = F.col("id")
    gender = x0 % 2
    x1 = F.floor(x0 / 2)
    marital = x1 % 5
    x2 = F.floor(x1 / 5)
    edu = x2 % 7
    x3 = F.floor(x2 / 7)
    purchase = (x3 % 20 + 1) * 500
    x4 = F.floor(x3 / 20)
    credit = x4 % 4
    x5 = F.floor(x4 / 4)
    dep = x5 % 7
    x6 = F.floor(x5 / 7)
    dep_emp = x6 % 7
    dep_col = F.floor(x6 / 7) % 7
    out = base.select(
        (x0 + 1).cast("int").alias("cd_demo_sk"),
        F.array(*[F.lit(v) for v in CD_GENDERS])[gender.cast("int")].alias("cd_gender"),
        F.array(*[F.lit(v) for v in CD_MARITAL])[marital.cast("int")].alias("cd_marital_status"),
        F.array(*[F.lit(v) for v in CD_EDUCATION])[edu.cast("int")].alias("cd_education_status"),
        purchase.cast("int").alias("cd_purchase_estimate"),
        F.array(*[F.lit(v) for v in CD_CREDIT])[credit.cast("int")].alias("cd_credit_rating"),
        dep.cast("int").alias("cd_dep_count"),
        dep_emp.cast("int").alias("cd_dep_employed_count"),
        dep_col.cast("int").alias("cd_dep_college_count"),
    )
    return conform(out, "customer_demographics")


def gen_promotion(
    spark: SparkSession, n_rows: int = 300, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """promotion: full 19-column spec schema; Y/N channel flags are the
    columns the q7-family filters on."""
    parts = partitions or min(n_rows, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1

    def yn(tag: str) -> Column:
        return F.when(_mod(tag, 2) == 0, "N").otherwise("Y")

    start_sk = (JULIAN_1998_01_01 + _mod(f"pst{seed}", 700)).cast("int")
    out = base.select(
        sk.cast("int").alias("p_promo_sk"),
        F.lpad(F.concat(F.lit("P"), sk.cast("string")), 16, "0").alias("p_promo_id"),
        start_sk.alias("p_start_date_sk"),
        (start_sk + _mod(f"pln{seed}", 40).cast("int") + 5).alias("p_end_date_sk"),
        (_mod(f"pit{seed}", 18_000) + 1).cast("int").alias("p_item_sk"),
        F.round(_u(f"pco{seed}") * 900 + 100, 2).cast("decimal(15,2)").alias("p_cost"),
        F.lit(1).cast("int").alias("p_response_target"),
        _pick(f"pnm{seed}", ["ought", "able", "pri", "ese", "anti", "cally"]).alias("p_promo_name"),
        yn(f"pd{seed}").alias("p_channel_dmail"),
        yn(f"pe{seed}").alias("p_channel_email"),
        yn(f"pc{seed}").alias("p_channel_catalog"),
        yn(f"ptv{seed}").alias("p_channel_tv"),
        yn(f"pr{seed}").alias("p_channel_radio"),
        yn(f"pp{seed}").alias("p_channel_press"),
        yn(f"pev{seed}").alias("p_channel_event"),
        yn(f"pdm{seed}").alias("p_channel_demo"),
        F.lit("Unknown").alias("p_channel_details"),
        F.lit("Unknown").alias("p_purpose"),
        yn(f"pda{seed}").alias("p_discount_active"),
    )
    return conform(out, "promotion")


def gen_time_dim(spark: SparkSession, partitions: int | None = None) -> DataFrame:
    """time_dim: one row per second of day (86,400 rows at every scale
    factor — a spec fixed-size table, `resources/TPC-datagen-notebook
    .scala:1276-1287`). t_time_sk = seconds-since-midnight, matching
    gen_store_sales' ss_sold_time_sk domain [0, 86400). Pure clock
    algebra over ``spark.range`` — no hashing, no shuffle."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, 86_400, 1, parts)
    sk = F.col("id")
    hour = F.floor(sk / 3600).cast("int")
    minute = (F.floor(sk / 60) % 60).cast("int")
    second = (sk % 60).cast("int")
    out = base.select(
        sk.cast("int").alias("t_time_sk"),
        F.lpad(F.concat(F.lit("T"), sk.cast("string")), 16, "0").alias("t_time_id"),
        sk.cast("int").alias("t_time"),
        hour.alias("t_hour"),
        minute.alias("t_minute"),
        second.alias("t_second"),
        F.when(hour < 12, "AM").otherwise("PM").alias("t_am_pm"),
        # The spec's three 8-hour shifts and their half-splits.
        F.when(hour < 8, "third")
        .when(hour < 16, "first")
        .otherwise("second")
        .alias("t_shift"),
        F.when(hour < 4, "night")
        .when(hour < 12, "morning")
        .when(hour < 20, "afternoon")
        .otherwise("evening")
        .alias("t_sub_shift"),
        F.when((hour >= 6) & (hour <= 8), "breakfast")
        .when((hour >= 11) & (hour <= 13), "lunch")
        .when((hour >= 17) & (hour <= 19), "dinner")
        .otherwise(None)
        .alias("t_meal_time"),
    )
    return conform(out, "time_dim")


# Public TPC-DS household_demographics domains — the table is the full
# cross product (7,200 rows at every scale factor): 20 income bands ×
# 6 buy potentials × 10 dependent counts × 6 vehicle counts.
HD_BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500", "Unknown"]
HD_ROWS = 20 * 6 * 10 * 6  # 7,200


def gen_household_demographics(spark: SparkSession, partitions: int | None = None) -> DataFrame:
    """household_demographics: the spec's exact cross-product table,
    decoded positionally from the surrogate key like
    gen_customer_demographics — zero randomness, identical rows under
    any partitioning."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, HD_ROWS, 1, parts)
    x0 = F.col("id")
    income = x0 % 20
    x1 = F.floor(x0 / 20)
    buy = x1 % 6
    x2 = F.floor(x1 / 6)
    dep = x2 % 10
    vehicle = F.floor(x2 / 10) % 6 - 1  # spec domain -1..4
    out = base.select(
        (x0 + 1).cast("int").alias("hd_demo_sk"),
        (income + 1).cast("int").alias("hd_income_band_sk"),
        F.array(*[F.lit(v) for v in HD_BUY_POTENTIAL])[buy.cast("int")].alias(
            "hd_buy_potential"
        ),
        dep.cast("int").alias("hd_dep_count"),
        vehicle.cast("int").alias("hd_vehicle_count"),
    )
    return conform(out, "household_demographics")


def gen_income_band(spark: SparkSession) -> DataFrame:
    """income_band: the spec's 20 fixed $10k brackets."""
    base = spark.range(0, 20, 1, 1)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("ib_income_band_sk"),
        (F.col("id") * 10_000 + F.when(F.col("id") == 0, 0).otherwise(1)).cast("int").alias(
            "ib_lower_bound"
        ),
        (sk * 10_000).cast("int").alias("ib_upper_bound"),
    )
    return conform(out, "income_band")


CA_CITIES = [
    "Midway", "Fairview", "Oak Grove", "Riverside", "Centerville",
    "Pleasant Hill", "Five Points", "Liberty", "Shiloh", "Union",
]
CA_STATES = S_STATES + ["CA", "WA", "NY", "VA", "KY", "MO"]
CA_LOCATION_TYPES = ["apartment", "condo", "single family"]


def gen_customer_address(
    spark: SparkSession, n_rows: int = 50_000, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """customer_address: full 13-column spec schema; sk domain 1..n
    matches gen_store_sales' ss_addr_sk (default 50k)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("ca_address_sk"),
        F.lpad(F.concat(F.lit("A"), sk.cast("string")), 16, "0").alias("ca_address_id"),
        (_mod(f"can{seed}", 900) + 100).cast("string").alias("ca_street_number"),
        F.concat_ws(
            " ",
            _pick(f"cas1{seed}", ["Main", "Oak", "Park", "First", "Elm", "Cedar", "Maple"]),
            _pick(f"cas2{seed}", ["", "Hill", "Ridge", "View", "Creek"]),
        ).alias("ca_street_name"),
        _pick(f"cast{seed}", ["Street", "Avenue", "Blvd", "Road", "Lane", "Court"]).alias(
            "ca_street_type"
        ),
        F.concat(F.lit("Suite "), (_mod(f"casu{seed}", 400) + 100).cast("string")).alias(
            "ca_suite_number"
        ),
        _pick(f"cacty{seed}", CA_CITIES).alias("ca_city"),
        _pick(f"cacnty{seed}", ["Williamson County", "Walker County", "Ziebach County", "Daviess County"]).alias(
            "ca_county"
        ),
        _pick(f"cast8{seed}", CA_STATES).alias("ca_state"),
        F.lpad((_mod(f"cazip{seed}", 90_000) + 10_000).cast("string"), 5, "0").alias("ca_zip"),
        F.lit("United States").alias("ca_country"),
        F.lit(-5.00).cast("decimal(5,2)").alias("ca_gmt_offset"),
        _pick(f"calt{seed}", CA_LOCATION_TYPES).alias("ca_location_type"),
    )
    return conform(out, "customer_address")


C_SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"]
C_FIRST_NAMES = [
    "James", "Mary", "John", "Patricia", "Robert", "Linda", "Michael",
    "Barbara", "William", "Elizabeth", "David", "Jennifer", "Richard",
    "Maria", "Charles", "Susan",
]
C_LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
    "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez",
]
C_COUNTRIES = ["United States", "Canada", "Mexico", "Brazil", "Germany", "Japan"]


def gen_customer_ds(
    spark: SparkSession, n_rows: int = 50_000, seed: int = 100, partitions: int | None = None
) -> DataFrame:
    """TPC-DS customer (distinct from the TPC-H ``gen_customer``): full
    18-column spec schema. FK domains line up with the sibling
    generators — cdemo 1..1,920,800, hdemo 1..7,200, addr 1..n_rows —
    so q19/q68/q73-family joins resolve."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)
    sk = F.col("id") + 1
    first = _pick(f"cfn{seed}", C_FIRST_NAMES)
    last = _pick(f"cln{seed}", C_LAST_NAMES)
    first_sales = (JULIAN_1998_01_01 + _mod(f"cfs{seed}", 700)).cast("int")
    out = base.select(
        sk.cast("int").alias("c_customer_sk"),
        F.lpad(F.concat(F.lit("C"), sk.cast("string")), 16, "0").alias("c_customer_id"),
        (_mod(f"ccd{seed}", 1_920_800) + 1).cast("int").alias("c_current_cdemo_sk"),
        (_mod(f"chd{seed}", HD_ROWS) + 1).cast("int").alias("c_current_hdemo_sk"),
        (_mod(f"cad{seed}", n_rows) + 1).cast("int").alias("c_current_addr_sk"),
        (first_sales + _mod(f"cfd{seed}", 30).cast("int")).alias("c_first_shipto_date_sk"),
        first_sales.alias("c_first_sales_date_sk"),
        _pick(f"csal{seed}", C_SALUTATIONS).alias("c_salutation"),
        first.alias("c_first_name"),
        last.alias("c_last_name"),
        F.when(_mod(f"cpf{seed}", 2) == 0, "N").otherwise("Y").alias("c_preferred_cust_flag"),
        (_mod(f"cbd{seed}", 28) + 1).cast("int").alias("c_birth_day"),
        (_mod(f"cbm{seed}", 12) + 1).cast("int").alias("c_birth_month"),
        (_mod(f"cby{seed}", 69) + 1924).cast("int").alias("c_birth_year"),
        _pick(f"cbc{seed}", C_COUNTRIES).alias("c_birth_country"),
        F.lit(None).cast("string").alias("c_login"),
        F.concat(
            F.lower(first), F.lit("."), F.lower(last), F.lit("."), sk.cast("string"),
            F.lit("@example.com"),
        ).alias("c_email_address"),
        (first_sales + _mod(f"clr{seed}", 1000).cast("int")).alias("c_last_review_date_sk"),
    )
    return conform(out, "customer")


R_REASONS = [
    "Package was damaged", "Stopped working", "Did not fit",
    "Not the product that was ordred", "Parts missing",
    "Does not work with a product that I have", "Gift exchange",
    "Did not like the color", "Did not like the model",
    "Did not like the make", "Did not like the warranty", "unauthoized purchase",
    "Duplicate purchase", "Found a better price in a store",
    "Found a better extended warranty in a store", "No service location in my area",
    "reason 17", "reason 18", "reason 19", "reason 20", "reason 21",
    "reason 22", "reason 23", "reason 24", "reason 25", "reason 26",
    "reason 27", "reason 28", "reason 29", "reason 30", "reason 31",
    "reason 32", "reason 33", "reason 34", "reason 35",
]


def gen_reason(spark: SparkSession) -> DataFrame:
    """reason: the spec's 35 return-reason rows (sf1 size)."""
    base = spark.range(0, len(R_REASONS), 1, 1)
    sk = F.col("id") + 1
    out = base.select(
        sk.cast("int").alias("r_reason_sk"),
        F.lpad(F.concat(F.lit("R"), sk.cast("string")), 16, "0").alias("r_reason_id"),
        F.array(*[F.lit(r) for r in R_REASONS])[F.col("id").cast("int")].alias(
            "r_reason_desc"
        ),
    )
    return conform(out, "reason")


def _uh(tag: str, *cols: Column) -> Column:
    """Uniform [0,1) double hashed from row CONTENT (not the range id) —
    for tables derived from another generated table's rows."""
    h = F.xxhash64(*cols, F.lit(tag))
    return (h.bitwiseAND(F.lit(_MASK53).cast("long"))).cast("double") / float(1 << 53)


def _modh(tag: str, n: int, *cols: Column) -> Column:
    return (F.xxhash64(*cols, F.lit(tag)) % n + n) % n


def gen_store_returns(
    spark: SparkSession, n_sales: int, seed: int = 100, return_rate: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """store_returns: a deterministic ~1/return_rate sample of
    gen_store_sales' rows, every sr_* column a pure function of the
    originating sale's content (`resources/TPC-datagen-notebook.scala
    :1228-1248` declares the 20-column schema; dsdgen likewise emits
    returns as a fact-derived stream). Keyed by (sr_item_sk,
    sr_ticket_number) so returns join their sales line; money columns
    satisfy the spec identities in exact decimal arithmetic
    (amt_inc_tax = amt + tax, refunded + reversed + credit = amt).

    Scale: inherits store_sales' embarrassing parallelism — the filter
    and projections are narrow, no shuffle, no driver state."""
    from lakehouse_dba_tools_spark.datagen.generator import gen_store_sales

    ss = gen_store_sales(spark, n_sales, seed=seed, partitions=partitions)
    key = [F.col("ss_ticket_number"), F.col("ss_item_sk"), F.col("ss_sold_date_sk")]
    picked = ss.where(_modh(f"ret{seed}", return_rate, *key) == 0)
    rq = (_modh(f"rq{seed}", 1_000_000, *key) % F.col("ss_quantity") + 1).cast("int")
    amt = F.round(F.col("ss_sales_price") * rq, 2).cast("decimal(7,2)")
    tax = F.round(amt * F.lit(0.05), 2).cast("decimal(7,2)")
    fee = F.round(_uh(f"rf{seed}", *key) * 99 + 1, 2).cast("decimal(7,2)")
    ship = F.round(_uh(f"rs{seed}", *key) * 25, 2).cast("decimal(7,2)")
    refunded = F.round(amt * F.lit(0.5), 2).cast("decimal(7,2)")
    reversed_ = F.round((amt - refunded) * F.lit(0.5), 2).cast("decimal(7,2)")
    out = picked.select(
        (F.col("ss_sold_date_sk") + (_modh(f"rd{seed}", 90, *key) + 1).cast("int"))
        .cast("int")
        .alias("sr_returned_date_sk"),
        _modh(f"rt{seed}", 86_400, *key).cast("int").alias("sr_return_time_sk"),
        F.col("ss_item_sk").alias("sr_item_sk"),
        F.col("ss_customer_sk").alias("sr_customer_sk"),
        F.col("ss_cdemo_sk").alias("sr_cdemo_sk"),
        F.col("ss_hdemo_sk").alias("sr_hdemo_sk"),
        F.col("ss_addr_sk").alias("sr_addr_sk"),
        F.col("ss_store_sk").alias("sr_store_sk"),
        (_modh(f"rr{seed}", len(R_REASONS), *key) + 1).cast("int").alias("sr_reason_sk"),
        F.col("ss_ticket_number").alias("sr_ticket_number"),
        rq.alias("sr_return_quantity"),
        amt.alias("sr_return_amt"),
        tax.alias("sr_return_tax"),
        (amt + tax).cast("decimal(7,2)").alias("sr_return_amt_inc_tax"),
        fee.alias("sr_fee"),
        ship.alias("sr_return_ship_cost"),
        refunded.alias("sr_refunded_cash"),
        reversed_.alias("sr_reversed_charge"),
        (amt - refunded - reversed_).cast("decimal(7,2)").alias("sr_store_credit"),
        (tax + fee + ship).cast("decimal(7,2)").alias("sr_net_loss"),
    )
    return conform(out, "store_returns")
