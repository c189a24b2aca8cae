"""PINNED reference-shaped fixtures for the golden byte-for-byte tests.

Everything here is a pure function of md5 (no RNG, no time), so the fixture
is identical on every machine and every run — the property that lets
tests/golden/ commit expected output BYTES.  Regenerate the goldens with
``python scripts/regen_golden.py`` (only needed when the fixture or the
engine's intended semantics change; the diff is then reviewed like code).

Shapes mirror FIXTURES.md §1 (retail CSV with every dirty-data class and
the rank-tie / product-tie semantics cases) and §4 (plato-like prose).
"""

from __future__ import annotations

import hashlib


def _h(*parts) -> int:
    """Deterministic 48-bit int from the md5 of the joined parts."""
    s = "|".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


RETAIL_HEADER = (
    "InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country"
)


def retail_csv_lines() -> list[str]:
    """~160 rows: 25 customers x 1-5 invoices x 1-4 lines, plus one row of
    each dirty class and the two planted tie cases."""
    lines = []
    for c in range(25):
        cust = 12000 + c
        n_inv = _h("ninv", c) % 5 + 1
        for k in range(n_inv):
            inv = 540000 + c * 10 + k
            day = _h("day", c, k) % 20 + 1
            hour = _h("hour", c, k) % 14 + 8
            minute = _h("min", c, k) % 60
            date = f"12/{day}/2010 {hour}:{minute:02d}"
            n_lines = _h("nlin", c, k) % 4 + 1
            for ln in range(n_lines):
                stock = 84000 + _h("stock", c, k, ln) % 30
                qty = _h("qty", c, k, ln) % 12 + 1
                price = (_h("price", c, k, ln) % 900 + 55) / 100.0
                lines.append(
                    f"{inv},{stock},ITEM,{qty},{date},{price},{cust},United Kingdom"
                )
    # dirty classes (each must be dropped by P1-P4)
    lines += [
        "545001,84001,MUG,6,12/2/2010 9:15,1.85,,United Kingdom",  # null customer
        "545002,84002,TRAY,-2,12/3/2010 9:20,2.75,12001,United Kingdom",  # qty<=0
        "545003,84003,JAR,6,12/4/2010 9:25,0.0,12002,United Kingdom",  # price<=0
        "C545004,84004,BOX,3,12/5/2010 9:30,5.95,12003,United Kingdom",  # cancelled
        "545005,84005,ALARM,24,not-a-date,3.75,12004,France",  # bad date
    ]
    # rank tie: two invoices of customer 12090 at the SAME timestamp (W2:
    # rank shares the number and leaves a gap)
    lines += [
        "549001,84010,HOLDER,2,12/6/2010 10:00,2.55,12090,United Kingdom",
        "549002,84011,LANTERN,3,12/6/2010 10:00,3.39,12090,United Kingdom",
        "549003,84010,HOLDER,1,12/7/2010 11:00,2.55,12090,United Kingdom",
    ]
    # product-frequency tie for customer 12091: both stocks appear in one
    # invoice each; spend tiebreak decides top_product (84021 dearer)
    lines += [
        "549010,84020,PEN,1,12/8/2010 12:00,1.00,12091,United Kingdom",
        "549011,84021,INK,1,12/9/2010 12:30,9.00,12091,United Kingdom",
    ]
    return lines


#: Plato-like prose (public-domain style, hand-written here): repeated
#: function words exercise the stop-word filter and a stable top-20.
CORPUS_LINES = [
    "The city is the soul of its citizens and the citizens are the soul of the city",
    "Justice in the city is the harmony of its parts each doing the work of its nature",
    "The guardians of the city must know the good and the good is known by reason",
    "An unexamined life is a life not worth living for a human being",
    "Knowledge of the forms is the highest knowledge and opinion is not knowledge",
    "The philosopher loves wisdom and wisdom is the knowledge of what truly is",
    "Courage is knowing what is to be feared and what is not to be feared",
    "Temperance is the agreement of the parts of the soul about who should rule",
    "The good city educates the desires of its citizens by music and by gymnastics",
    "A just man is happier than an unjust man whatever the many may say",
    "The cave shows how the soul turns from shadows toward the light of the good",
    "Those who see the light must return to the cave and govern for the city",
]


def materialize_retail_csv(path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join([RETAIL_HEADER, *retail_csv_lines()]) + "\n")


def materialize_documents_dir(spark, dir_path: str) -> str:
    """Write CORPUS_LINES as a documents.parquet matching the testdata
    schema, so the existing Q1 operators run unchanged over the fixture."""
    import os

    os.makedirs(dir_path, exist_ok=True)
    rows = [
        (i, t, "en", "plato-like", len(t)) for i, t in enumerate(CORPUS_LINES)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(dir_path + "/documents.parquet")
    return dir_path


def df_to_csv_text(df, sort_cols: list[str]) -> str:
    """Deterministic CSV serialization: collected rows sorted by
    ``sort_cols``, floats via repr-minimal str() (matching the reference's
    pandas-written artifacts: 77183.6, 615.71), None → empty."""

    def cell(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return str(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    cols = df.columns
    rows = sorted(
        ([cell(r[c]) for c in cols] for r in df.collect()),
        key=lambda vals: [vals[cols.index(c)] for c in sort_cols],
    )
    return "\n".join([",".join(cols), *[",".join(r) for r in rows]]) + "\n"
