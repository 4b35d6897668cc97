"""Generate lakehouse_dba_tools_spark/workload/tpcds_corpus.py.

Extracts official TPC-DS v2.13 query text from DuckDB's bundled tpcds
extension (public spec content, same corpus the reference's dbstress
drives from queries/tpcds_2.13/*.sql — dbstress__Current.py:93-103)
and applies the MINIMAL adaptations needed to run against the
generated warehouse on BOTH engines:

- substitution parameters mapped into the generated data's domains
  (facts span d_year 1998-1999; month_seq base 1176; manufact/manager
  ids 1-100; the dim vocabularies are dsdgen's own, so most string
  params pass through unchanged);
- double-quoted aliases -> bare identifiers (Spark treats "..." as a
  string literal);
- comments stripped, trailing semicolon dropped.

Re-run after changing SUBS and paste/commit the regenerated module.
"""

from __future__ import annotations

import re

import duckdb

# Chosen corpus: a broad slice of shapes (star rollups, demographic
# star, EXISTS/NOT EXISTS, derived-table counts, scalar slot matrix,
# promo ratio, inventory probes, two-date-role chains) whose default
# params map cleanly onto the generated domains.
SUBS: dict[int, list[tuple[str, str]]] = {
    3: [("i_manufact_id = 128", "i_manufact_id = 43")],
    7: [("d_year = 2000", "d_year = 1998")],
    12: [],
    13: [("d_year = 2001", "d_year = 1998")],
    15: [("d_year = 2001", "d_year = 1999")],
    19: [],
    20: [],
    25: [("d_year = 2001", "d_year = 1999")],
    26: [("d_year = 2000", "d_year = 1998")],
    27: [("d_year = 2002", "d_year = 1998")],
    29: [],
    37: [
        ("BETWEEN 68 AND 68 + 30", "BETWEEN 20 AND 20 + 30"),
        ("2000-02-01", "1998-02-01"),
        ("2000-04-01", "1998-04-01"),
        (re.compile(r"i_manufact_id IN \([^)]*\)"), "i_manufact_id IN (67, 94, 69, 80)"),
    ],
    42: [("d_year=2000", "d_year=1998")],
    43: [("d_year = 2000", "d_year = 1998")],
    48: [
        ("d_year = 2000", "d_year = 1998"),
        (re.compile(r"ca_state IN \([^)]*\)", ), "__STATEARM__"),
    ],
    52: [("d_year=2000", "d_year=1998")],
    55: [],
    61: [],
    62: [("BETWEEN 1200 AND 1200 + 11", "BETWEEN 1176 AND 1176 + 11")],
    68: [
        (re.compile(r"s_city IN \([^)]*\)"), "s_city IN ('Fairview', 'Midway')"),
        (re.compile(r"d_year IN \([^)]*\)"), "d_year IN (1998, 1999)"),
    ],
    73: [
        (re.compile(r"s_county IN \([^)]*\)"),
         "s_county IN ('Williamson County', 'Ziebach County', 'Walker County')"),
        (re.compile(r"d_year IN \([^)]*\)"), "d_year IN (1998, 1999)"),
    ],
    79: [(re.compile(r"d_year IN \([^)]*\)"), "d_year IN (1998, 1999)")],
    84: [("'Edgewood'", "'Fairview'")],
    88: [],
    91: [("ca_gmt_offset = -7", "ca_gmt_offset = -5")],
    94: [],
    96: [],
}

# Round-6 continuation: 12 MORE official texts for the trailing
# extended-coverage query (tpcds_sqltext_extended — diffcheck-only, so
# bench cost is unaffected). Same adaptation discipline: params mapped
# into generated domains; q41's attribute vocabulary is remapped
# pairwise (each OR-pair keeps two DISTINCT generated values).
EXT_SUBS: dict[int, list[tuple[str, str]]] = {
    6: [("d_year = 2001", "d_year = 1998")],
    9: [],  # bucket thresholds compare against counts; any outcome is deterministic
    16: [("'2002-02-01'", "'1998-02-01'"), ("'2002-04-02'", "'1998-04-02'")],
    38: [("BETWEEN 1200 AND 1200 + 11", "BETWEEN 1176 AND 1176 + 11")],
    41: [
        ("BETWEEN 738 AND 738+40", "BETWEEN 30 AND 30+40"),
        # units not in the generated vocabulary, mapped pair-safely
        ("'Ounce'", "'Each'"),
        ("i_units = 'N/A'", "i_units = 'Unknown'"),
        ("'Pallet'", "'Case'"),
        ("'Gross'", "'Gram'"),
        ("'Cup'", "'Box'"),
        ("'Dram'", "'Bunch'"),
        ("'Tbl'", "'Ton'"),
        ("'Lb'", "'Oz'"),
        ("'Bundle'", "'Pound'"),
        # colors not in the generated vocabulary, mapped pair-safely
        ("'powder'", "'coral'"),
        ("'honeydew'", "'almond'"),
        ("'floral'", "'azure'"),
        ("'deep'", "'blue'"),
        ("'light'", "'gold'"),
        ("'cornflower'", "'ivory'"),
        ("'midnight'", "'black'"),
        ("'snow'", "'cream'"),
        ("'papaya'", "'green'"),
        ("'orange'", "'indigo'"),
        ("'frosted'", "'beige'"),
        ("'forest'", "'green'"),
        ("'ghost'", "'ivory'"),
    ],
    45: [
        (
            re.compile(r"IN \('85669',[^)]*\)"),
            "IN ('49229', '15387', '28946', '51897', '89433', "
            "'67978', '51519', '44776', '15683')",
        ),
        ("d_year = 2001", "d_year = 1998"),
    ],
    50: [("d2.d_year = 2001", "d2.d_year = 1998")],
    65: [],  # DuckDB's bundled text already uses the 1176 month_seq base
    82: [
        ("'2000-05-25'", "'1998-05-25'"),
        ("'2000-07-24'", "'1998-07-24'"),
        (re.compile(r"IN \(129,[^)]*\)"), "IN (29, 70, 82, 43)"),
    ],
    87: [("BETWEEN 1200 AND 1200+11", "BETWEEN 1176 AND 1176+11")],
    90: [],  # hour/dep-count/char-count params all inside generated domains
    93: [("'reason 28'", "'Stopped working'")],
    97: [("BETWEEN 1200 AND 1200 + 11", "BETWEEN 1176 AND 1176 + 11")],
    99: [("BETWEEN 1200 AND 1200 + 11", "BETWEEN 1176 AND 1176 + 11")],
    # batch 2 (round-6 continuation): 8 more singles
    21: [
        ("'2000-03-11'", "'1998-03-11'"),
        ("'2000-02-10'", "'1998-02-10'"),
        ("'2000-04-10'", "'1998-04-10'"),
    ],
    32: [
        ("i_manufact_id = 977", "i_manufact_id = 43"),
        ("'2000-01-27'", "'1998-01-27'"),
        ("'2000-04-26'", "'1998-04-26'"),
    ],
    60: [],  # d_year 1998 / d_moy 9 / gmt -5 / 'Music' all already in-domain
    63: [
        ("1200", "1176"),
        # spec class/brand vocabularies mapped into the generated ones
        (
            re.compile(r"i_class IN \('personal',[^)]*\)"),
            "i_class IN ('computers', 'fiction', 'bedding', 'decor')",
        ),
        (
            re.compile(r"i_class IN \('accessories',[^)]*\)"),
            "i_class IN ('accent', 'classical', 'dresses', 'fitness')",
        ),
        (
            re.compile(r"i_brand IN \('scholaramalgamalg #14',[^)]*\)"),
            "i_brand IN ('Brand#1-1', 'Brand#2-2', 'Brand#3-3', 'Brand#4-4')",
        ),
        (
            re.compile(r"i_brand IN \('amalgimporto #1',[^)]*\)"),
            "i_brand IN ('Brand#1-2', 'Brand#2-3', 'Brand#3-4', 'Brand#4-5')",
        ),
    ],
    69: [
        (re.compile(r"IN \('KY',[^)]*\)"), "IN ('KY', 'GA', 'MO')"),
        ("d_year = 2001", "d_year = 1998"),
    ],
    92: [
        ("i_manufact_id = 350", "i_manufact_id = 70"),
        ("'2000-01-27'", "'1998-01-27'"),
        ("'2000-04-26'", "'1998-04-26'"),
    ],
    95: [],  # 1999 ship window, ca_state IL, company 'pri' all in-domain
    98: [],  # 1999 date window and category list already in-domain
    # batch 3: ten more singles
    28: [],  # pure store_sales numeric bucket ranges, all in-domain
    33: [],  # 1998/moy-5/gmt-5/'Electronics' already in-domain
    34: [
        (re.compile(r"IN \(1999,[^)]*\)"), "IN (1998, 1998+1, 1998+2)"),
        # generated baskets carry <=3 lines and ticket lines draw
        # independent demographics, so the surviving-lines-per-ticket
        # band scales from the spec's 15-20 to 1-3
        ("cnt BETWEEN 15 AND 20", "cnt BETWEEN 1 AND 3"),
    ],
    36: [("d1.d_year = 2001", "d1.d_year = 1998")],
    40: [
        ("'2000-03-11'", "'1998-03-11'"),
        ("'2000-02-10'", "'1998-02-10'"),
        ("'2000-04-10'", "'1998-04-10'"),
    ],
    44: [],  # store_sk 4 exists; ss_addr_sk never NULL → both engines
    # agree the 0.9*avg-of-empty HAVING yields an empty rank set
    53: [
        ("1200", "1176"),
        (
            re.compile(r"i_class IN \('personal',[^)]*\)"),
            "i_class IN ('computers', 'fiction', 'bedding', 'decor')",
        ),
        (
            re.compile(r"i_class IN \('accessories',[^)]*\)"),
            "i_class IN ('accent', 'classical', 'dresses', 'fitness')",
        ),
        (
            re.compile(r"i_brand IN \('scholaramalgamalg #14',[^)]*\)"),
            "i_brand IN ('Brand#1-1', 'Brand#2-2', 'Brand#3-3', 'Brand#4-4')",
        ),
        (
            re.compile(r"i_brand IN \('amalgimporto #1',[^)]*\)"),
            "i_brand IN ('Brand#1-2', 'Brand#2-3', 'Brand#3-4', 'Brand#4-5')",
        ),
    ],
    56: [
        ("'slate'", "'azure'"),
        ("'blanched'", "'almond'"),
        ("'burnished'", "'beige'"),
        ("d_year = 2001", "d_year = 1998"),
    ],
    70: [("BETWEEN 1200 AND 1200+11", "BETWEEN 1176 AND 1176+11")],
    86: [("BETWEEN 1200 AND 1200+11", "BETWEEN 1176 AND 1176+11")],
    89: [
        (
            re.compile(r"i_class IN \('computers',[^)]*\)"),
            "i_class IN ('computers', 'classical', 'fitness')",
        ),
        (
            re.compile(r"i_class IN \('shirts',[^)]*\)"),
            "i_class IN ('kids', 'bracelets', 'dresses')",
        ),
    ],
    # batch 4: seven more singles (q76 deliberately omitted — the
    # generated facts carry no NULL fks, so the official text would be
    # deterministically empty; the engine's q76 twin injects NULLs via
    # an md5 rule instead)
    22: [("BETWEEN 1200 AND 1200 + 11", "BETWEEN 1176 AND 1176 + 11")],
    46: [
        (re.compile(r"IN \(1999,[^)]*\)"), "IN (1998, 1998+1, 1998+2)"),
    ],  # 'Fairview'/'Midway' are generated cities; dow/demographics in-domain
    # q58/q83 are legitimately EMPTY at gate scale (a single week of
    # sales / the ~300-row returns facts can't satisfy the 0.9-1.1
    # equal-channel ratio bands) — both engines agree on 0, like q44
    58: [("'2000-01-03'", "'1998-02-02'")],
    66: [
        ("d_year = 2001", "d_year = 1998"),
        ("('DHL','BARIAN')", "('UPS','FEDEX')"),
    ],
    71: [],  # 1999/moy-11 and breakfast/dinner meal times all in-domain
    77: [("'2000-08-23'", "'1998-08-23'"), ("'2000-09-22'", "'1998-09-22'")],
    83: [
        ("'2000-06-30'", "'1998-06-30'"),
        ("'2000-09-27'", "'1998-09-27'"),
        ("'2000-11-17'", "'1998-11-17'"),
    ],
    # batch 5: eleven more singles
    1: [("d_year = 2000", "d_year = 1998")],
    30: [("d_year = 2002", "d_year = 1998")],
    31: [("d_year = 2000", "d_year = 1998")],
    35: [("d_year = 2002", "d_year = 1998")],
    47: [],  # 1999-centered lag/lead chain: Dec-1998 prev exists; the
    # empty Jan-2000 lead arm is filtered by the rn join on both engines
    49: [("d_year = 2001", "d_year = 1998")],
    57: [],  # same 1999-centered structure as q47
    # covers both curr_yr.d_year=2002 and prev_yr.d_year=2002-1 → 1999/1998
    75: [("d_year=2002", "d_year=1999")],
    78: [("ss_sold_year=2000", "ss_sold_year=1998")],
    80: [("'2000-08-23'", "'1998-08-23'"), ("'2000-09-22'", "'1998-09-22'")],
    81: [("d_year = 2000", "d_year = 1998")],
    # batch 7 completes the corpus — ALL 99 official texts execute:
    # DuckDB's bundle ships ONE statement per query number, so the
    # spec's two-statement files arrive single; q8's 400-zip
    # substitution list is regenerated from the generated address
    # space (exactly what dsdgen's param generator does); q76's
    # NULL-fk probe is deterministically EMPTY over the generated
    # facts (no null fks) with both engines agreeing — the engine's
    # DataFrame twin injects nulls via an md5 rule to get a non-empty
    # version of the same shape.
    76: [],
    8: [
        # zip substitution list regenerated from the generated address
        # space (what dsdgen's param generator does), restricted to
        # zips that carry preferred customers and share a store's
        # 2-digit prefix so the intersect→store join is non-vacuous
        (
            re.compile(r"IN \('24128',[^)]*\)"),
            "IN ('17025', '17053', '17132', '17241', '17298', '17337', "
            "'17352', '17426', '17493', '17615', '17622', '17648', "
            "'17649', '17702', '17792', '17831', '17833', '17947', "
            "'17956', '17983', '17992', '20214', '20274', '20369', "
            "'20389')",
        ),
        # generated zip-5 groups top out at 6 addresses (~3 preferred);
        # scale the spec's >10-preferred band accordingly
        ("count(*) > 10", "count(*) > 2"),
    ],
    14: [("1999", "1997")],  # 3-year window → 1997-1999; current month
    # 1997+2/moy-11 lands in Nov 1999 sales
    23: [
        (re.compile(r"IN \(2000,[^)]*\)"), "IN (1996, 1996+1, 1996+2, 1996+3)"),
        (re.compile(r"d_year = 2000(\s+)AND d_moy = 2"), r"d_year = 1998\1AND d_moy = 2"),
        # gate-scale baskets never repeat an item >4× per day; scale
        # the frequent-item band to the generated density
        ("count(*) >4", "count(*) >1"),
    ],
    24: [("'peach'", "'coral'"), ("s_market_id=8", "s_market_id=5")],
    39: [("=2001", "=1998")],
    # batch 6: the rest of the adaptable singles
    4: [("2001", "1998")],  # 6 occurrences, all year params (3-channel q11)
    64: [
        ("1999", "1998"),  # syear pair → 1998/1999, both with sales
        (
            re.compile(r"IN \('purple',[^)]*\)"),
            "IN ('coral', 'almond', 'azure', 'blue', 'gold', 'ivory')",
        ),
    ],
    2: [("d_year = 2001", "d_year = 1998")],  # the +1 arm follows to 1999
    5: [("'2000-08-23'", "'1998-08-23'"), ("'2000-09-06'", "'1998-09-06'")],
    10: [
        (
            re.compile(r"IN \('Rush County',[^)]*\)"),
            "IN ('Daviess County', 'Ziebach County', 'Williamson County', "
            "'Walker County', 'Daviess County')",
        ),
        ("d_year = 2002", "d_year = 1998"),
    ],
    11: [("2001", "1998")],  # 4 occurrences, all year params
    17: [("2001Q", "1998Q")],
    18: [
        (
            re.compile(r"IN \('MS',[^)]*\)"),
            "IN ('MO', 'OH', 'KY', 'TX', 'CA', 'VA', 'MO')",
        ),
    ],
    51: [("BETWEEN 1200 AND 1200+11", "BETWEEN 1176 AND 1176+11")],
    54: [("'maternity'", "'dresses'")],  # 1998/moy-12 already in-domain
    59: [("1212", "1176")],  # both 12-month windows land inside 1176-1199
    67: [("BETWEEN 1200 AND 1200+11", "BETWEEN 1176 AND 1176+11")],
    72: [],  # 1999 / '>10000' / date+int arithmetic all in-domain
    74: [("2001", "1998")],  # 8 occurrences, all year params
    85: [
        (re.compile(r"IN \('IN',\s*'OH',\s*'NJ'\)"), "IN ('OH', 'TX', 'KY')"),
        (re.compile(r"IN \('WI',\s*'CT',\s*'KY'\)"), "IN ('FL', 'CA', 'MO')"),
        (re.compile(r"IN \('LA',\s*'IA',\s*'AR'\)"), "IN ('TN', 'IL', 'NY')"),
        ("d_year = 2000", "d_year = 1998"),
    ],
}

# q48 has three different ca_state arms; cycle through generated states
STATE_ARMS = [
    "ca_state IN ('CA', 'WA', 'TX')",
    "ca_state IN ('GA', 'FL', 'MI')",
    "ca_state IN ('TN', 'OH', 'IL')",
]

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)
_QUOTED_ALIAS_RE = re.compile(r'"([^"]+)"')


def _ident(name: str) -> str:
    out = re.sub(r"[^A-Za-z0-9]+", "_", name).strip("_")
    if out and out[0].isdigit():
        out = "d" + out
    return out or "col"


def adapt(n: int, sql: str, subs: dict | None = None) -> str:
    sql = _COMMENT_RE.sub("", sql).strip().rstrip(";").strip()
    for old, new in (subs or SUBS)[n]:
        if isinstance(old, str):
            assert old in sql, (n, old)
            sql = sql.replace(old, new)
        else:
            assert old.search(sql), (n, old.pattern)
            sql = old.sub(new, sql)
    if "__STATEARM__" in sql:
        for arm in STATE_ARMS:
            sql = sql.replace("__STATEARM__", arm, 1)
        assert "__STATEARM__" not in sql
    sql = _QUOTED_ALIAS_RE.sub(lambda m: _ident(m.group(1)), sql)
    return sql


def main() -> None:
    con = duckdb.connect()
    con.execute("LOAD tpcds")
    entries = []
    for n in sorted(SUBS):
        raw = con.execute(
            "SELECT query FROM tpcds_queries() WHERE query_nr = ?", [n]
        ).fetchone()[0]
        entries.append((f"q{n:02d}", adapt(n, raw)))
    lines = [
        '"""Adapted TPC-DS v2.13 query texts for the SQL-text stress tier.',
        "",
        "GENERATED by tools/gen_tpcds_corpus.py — edit SUBS there and re-run;",
        "do not hand-edit the texts. Source: the official TPC-DS corpus as",
        "bundled by DuckDB's tpcds extension (the same public corpus the",
        "reference's dbstress harness loads from queries/tpcds_2.13/*.sql,",
        "evaluation_tools/dbstress__Current.py:93-103), with substitution",
        "parameters mapped into the generated warehouse's domains and",
        'double-quoted aliases rewritten (Spark parses "..." as a string).',
        '"""',
        "",
        "CORPUS: dict[str, str] = {",
    ]
    for name, sql in entries:
        body = sql.replace("\\", "\\\\").replace('"""', '\\"\\"\\"')
        lines.append(f'    "{name}": """\\\n{body}\n""",')
    lines.append("}")
    ext_entries = []
    for n in sorted(EXT_SUBS):
        raw = con.execute(
            "SELECT query FROM tpcds_queries() WHERE query_nr = ?", [n]
        ).fetchone()[0]
        ext_entries.append((f"q{n:02d}", adapt(n, raw, EXT_SUBS)))
    lines += [
        "",
        "# Extended-coverage texts (EXT_SUBS): driven by the trailing",
        "# tpcds_sqltext_extended query — diffcheck-only, bench-neutral.",
        "CORPUS_EXT: dict[str, str] = {",
    ]
    for name, sql in ext_entries:
        body = sql.replace("\\", "\\\\").replace('"""', '\\"\\"\\"')
        lines.append(f'    "{name}": """\\\n{body}\n""",')
    lines.append("}")
    path = "lakehouse_dba_tools_spark/workload/tpcds_corpus.py"
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {path}: {len(entries)} + {len(ext_entries)} queries")


if __name__ == "__main__":
    main()
