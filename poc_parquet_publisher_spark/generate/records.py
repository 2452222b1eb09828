"""Spark-native synthetic Record generator.

Rebuilds cmd/create-test-data/main.go:97-177 (operators S18-S25 in
SURVEY.md section 2.1) as pure column expressions over ``spark.range(n)``:
no Python in the row loop, so generation scales linearly with executors
(the reference writes single-threaded through one Go writer).

Value domains are copied from the reference's literal pools
(main.go:24-34, domains at :149) -- they are the *spec* of the data, not
code. Randomness: top-level columns use seeded ``rand()``; values inside
higher-order-function lambdas (where non-deterministic expressions are
not allowed) derive from ``xxhash64(row_idx, element_idx, salt)``, which
also makes them stable under task retry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Literal value pools: cmd/create-test-data/main.go:24-34, :149.
FIRST_NAMES = ["James", "Mary", "John", "Patricia", "Robert",
               "Jennifer", "Michael", "Linda", "William", "Elizabeth"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Brown", "Jones",
              "Garcia", "Miller", "Davis", "Rodriguez", "Martinez"]
CITIES = ["New York", "Los Angeles", "Chicago", "Houston", "Phoenix",
          "Philadelphia", "San Antonio", "San Diego"]
STATES = ["NY", "CA", "IL", "TX", "AZ", "PA", "FL", "OH", "GA", "NC"]
STREETS = ["Main St", "Oak Ave", "Maple Dr", "Cedar Ln",
           "Washington St", "Park Ave", "Lake Dr", "River Rd"]
COUNTRIES = ["USA", "Canada", "UK", "Australia", "Germany", "France",
             "Japan", "Brazil"]
LANGUAGES = ["en", "es", "fr", "de", "it", "pt", "ja", "zh"]
ACCOUNT_TYPES = ["free", "basic", "premium", "enterprise"]
ACCOUNT_STATUSES = ["active", "suspended", "pending", "closed"]
COMM_PREFS = ["email", "sms", "phone", "mail"]
TAGS = ["vip", "new", "returning", "priority", "special_offer",
        "seasonal", "promotional"]
EMAIL_DOMAINS = ["gmail.com", "yahoo.com", "hotmail.com", "outlook.com"]

BODY_LENGTH = 1000  # main.go:20
BODY_CHARSET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789 "
)  # main.go:171

_ADDRESS_SCHEMA = T.StructType(
    [
        T.StructField("street", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

# Field order mirrors internal/models/record.go:6-35 (struct-tag names).
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone_number", T.StringType()),
        T.StructField("date_of_birth", T.StringType()),
        T.StructField("address", _ADDRESS_SCHEMA),
        T.StructField("account_type", T.StringType()),
        T.StructField("account_status", T.StringType()),
        T.StructField("last_login_date", T.TimestampType()),
        T.StructField("account_balance", T.DoubleType()),
        T.StructField("language", T.StringType()),
        T.StructField(
            "communication_preferences", T.ArrayType(T.StringType())
        ),
        T.StructField("newsletter_subscribed", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("body", T.StringType()),
    ]
)

_SEEDS = {name: i * 104729 + 13 for i, name in enumerate(
    ["created", "first", "last", "email_f", "email_l", "email_d",
     "ph1", "ph2", "ph3", "dob_y", "dob_m", "dob_d", "street_n", "street",
     "city", "state", "postal", "country", "type", "status", "login",
     "bal_i", "bal_f", "lang", "n_prefs", "news", "n_tags"]
)}


def _rand_int(bound: int, seed: int) -> Column:
    """rand.Intn(bound) analog: uniform int in [0, bound)."""
    return F.floor(F.rand(seed) * bound).cast("int")


def _choice(pool: list[str], seed: int) -> Column:
    """randomFromSlice (main.go:144-146): S18."""
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, _rand_int(len(pool), seed) + 1)


def _hash_choice(pool: list[str], idx: Column, i: Column, salt: int) -> Column:
    """Deterministic choice for use inside HOF lambdas (retry-stable)."""
    arr = F.array(*[F.lit(x) for x in pool])
    slot = F.pmod(F.xxhash64(idx, i, F.lit(salt)), F.lit(len(pool)))
    return F.element_at(arr, (slot + 1).cast("int"))


def _sampled_array(
    pool: list[str], idx: Column, n: Column, salt: int
) -> Column:
    """1..n draws with replacement (S25; main.go:127-139)."""
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: _hash_choice(pool, idx, i, salt),
        )
    )


def _body(idx: Column, length: int = BODY_LENGTH) -> Column:
    """S23: ``length`` chars drawn from the 63-char pool (main.go:170-177).

    One xxhash64 yields TEN characters (ten disjoint 6-bit windows of
    the 64-bit hash, each mod 63): 100 hashes per 1000-char body instead
    of 1000. Measured ~2x on generator_write; the residual per-char mod
    bias (64->63, ~1.6%) matches the single-hash-per-char variant's.
    Still a pure function of ``idx`` -- retry/rescale-deterministic.
    """
    chars = F.array(*[F.lit(c) for c in BODY_CHARSET])
    per_hash = 10  # 10 windows x 6 bits = 60 of the 64 hash bits
    n_hashes = (length + per_hash - 1) // per_hash

    def chunk(i: Column) -> Column:
        h = F.xxhash64(idx, i, F.lit(777))
        return F.concat(
            *[
                F.element_at(
                    chars,
                    (
                        F.pmod(
                            F.shiftrightunsigned(h, 6 * j),
                            F.lit(len(BODY_CHARSET)),
                        )
                        + 1
                    ).cast("int"),
                )
                for j in range(per_hash)
            ]
        )

    return F.substring(
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(n_hashes)), chunk), ""
        ),
        1,
        length,
    )


def generate_records(spark: SparkSession, n: int) -> DataFrame:
    """``n`` synthetic Records with the reference's exact value domains.

    generateRecord (main.go:97-142) re-expressed as one projection over
    ``spark.range(n)``; each helper cites its reference operator.
    """
    idx = F.col("idx")
    now = F.current_timestamp()
    df = spark.range(n).withColumnRenamed("id", "idx")
    return df.select(
        F.expr("uuid()").alias("id"),  # S19, main.go:100
        # S24: now - rand(365)d / now (main.go:101-102)
        (now - F.make_interval(days=_rand_int(365, _SEEDS["created"])))
        .alias("created_at"),
        now.alias("updated_at"),
        _choice(FIRST_NAMES, _SEEDS["first"]).alias("first_name"),
        _choice(LAST_NAMES, _SEEDS["last"]).alias("last_name"),
        # S20 (main.go:148-154): email names drawn INDEPENDENTLY of
        # first_name/last_name, exactly like generateEmail().
        F.concat(
            F.lower(_choice(FIRST_NAMES, _SEEDS["email_f"])),
            F.lit("."),
            F.lower(_choice(LAST_NAMES, _SEEDS["email_l"])),
            F.lit("@"),
            _choice(EMAIL_DOMAINS, _SEEDS["email_d"]),
        ).alias("email"),
        # S21 (main.go:156-161)
        F.format_string(
            "+1-%03d-%03d-%04d",
            _rand_int(800, _SEEDS["ph1"]) + 200,
            _rand_int(900, _SEEDS["ph2"]) + 100,
            _rand_int(9000, _SEEDS["ph3"]) + 1000,
        ).alias("phone_number"),
        # S22 (main.go:163-168): a STRING, not a date -- reference keeps
        # DOB string-typed (record.go:16).
        F.format_string(
            "%04d-%02d-%02d",
            _rand_int(50, _SEEDS["dob_y"]) + 1950,
            _rand_int(12, _SEEDS["dob_m"]) + 1,
            _rand_int(28, _SEEDS["dob_d"]) + 1,
        ).alias("date_of_birth"),
        # main.go:121-125
        F.struct(
            F.format_string(
                "%d %s",
                _rand_int(9999, _SEEDS["street_n"]),
                _choice(STREETS, _SEEDS["street"]),
            ).alias("street"),
            _choice(CITIES, _SEEDS["city"]).alias("city"),
            _choice(STATES, _SEEDS["state"]).alias("state"),
            F.format_string(
                "%05d", _rand_int(99999, _SEEDS["postal"])
            ).alias("postal_code"),
            _choice(COUNTRIES, _SEEDS["country"]).alias("country"),
        ).alias("address"),
        _choice(ACCOUNT_TYPES, _SEEDS["type"]).alias("account_type"),
        _choice(ACCOUNT_STATUSES, _SEEDS["status"]).alias("account_status"),
        (now - F.make_interval(days=_rand_int(30, _SEEDS["login"])))
        .alias("last_login_date"),
        # main.go:113: float64(Intn(10000)) + Float64()
        (
            _rand_int(10000, _SEEDS["bal_i"]).cast("double")
            + F.rand(_SEEDS["bal_f"])
        ).alias("account_balance"),
        _choice(LANGUAGES, _SEEDS["lang"]).alias("language"),
        # main.go:128: 1 + Intn(len(commPrefs)) draws
        _sampled_array(
            COMM_PREFS,
            idx,
            _rand_int(len(COMM_PREFS), _SEEDS["n_prefs"]) + 1,
            101,
        ).alias("communication_preferences"),
        (F.rand(_SEEDS["news"]) > 0.5).alias("newsletter_subscribed"),
        # main.go:135: Intn(4) draws (possibly zero)
        _sampled_array(
            TAGS, idx, _rand_int(4, _SEEDS["n_tags"]), 202
        ).alias("tags"),
        _body(idx).alias("body"),
    )
