"""Property round-trip of the typed JSON converter (JsonCdcParser) —
the analog of moonlink's REST JSON converter with per-field validation
(/root/reference/src/moonlink/src/rest_ingest/json_converter.rs:34-200,
decimal_utils.rs). Input columns carry the types ray.data.read_json
would infer (int64 / double / string), the parser must produce exactly
the declared schema types, and tolerant mode must drop EXACTLY the
inconvertible rows — no silent corruption in either direction."""

from datetime import datetime
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from moonlink_ray.sources.json_ingest import JsonCdcParser, JsonRowError

SCHEMA_LIST = [["image_id", "string"], ["n", "int32"],
               ["score", "float64"], ["price", "decimal128(9,2)"],
               ["ts", "timestamp[us]"]]

INT32 = 2**31

row_st = st.tuples(
    st.text(alphabet="abc-0123456789", min_size=1, max_size=12),
    st.integers(min_value=-2**40, max_value=2**40),      # overflows int32
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    # price in cents; decimal128(9,2) holds at most 9999999.99, i.e.
    # |cents| <= 999_999_999 — overflow beyond that is its own typed
    # error, covered by the lossy-decimal test below
    st.integers(min_value=-(10**9 - 1), max_value=10**9 - 1),
    st.datetimes(min_value=datetime(1990, 1, 1),
                 max_value=datetime(2100, 1, 1)),
)


def _batch(rows):
    """Shape the rows the way read_json hands them to the parser."""
    return pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "score": pa.array([r[2] for r in rows], pa.float64()),
        "price": pa.array([str(Decimal(r[3]).scaleb(-2)) for r in rows],
                          pa.string()),
        "ts": pa.array([r[4].isoformat() for r in rows], pa.string()),
    })


@settings(max_examples=200, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=30))
def test_tolerant_parse_round_trips_exactly_the_convertible_rows(rows):
    parser = JsonCdcParser(strict=False, cdc=False, schema_list=SCHEMA_LIST)
    got = parser(_batch(rows))
    keep = [r for r in rows if -INT32 <= r[1] < INT32]
    assert got.num_rows == len(keep)
    assert got.schema.types == [pa.string(), pa.int32(), pa.float64(),
                                pa.decimal128(9, 2), pa.timestamp("us")]
    assert got["image_id"].to_pylist() == [r[0] for r in keep]
    assert got["n"].to_pylist() == [r[1] for r in keep]
    assert got["score"].to_pylist() == pytest.approx(
        [r[2] for r in keep], nan_ok=False)
    assert got["price"].to_pylist() == \
        [Decimal(r[3]).scaleb(-2) for r in keep]
    assert got["ts"].to_pylist() == [r[4] for r in keep]


@settings(max_examples=100, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=30))
def test_strict_parse_all_or_typed_error(rows):
    parser = JsonCdcParser(strict=True, cdc=False, schema_list=SCHEMA_LIST)
    if all(-INT32 <= r[1] < INT32 for r in rows):
        got = parser(_batch(rows))
        assert got.num_rows == len(rows)
    else:
        with pytest.raises(JsonRowError, match="n"):
            parser(_batch(rows))


@settings(max_examples=100, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=20),
       st.integers(min_value=0, max_value=19))
def test_tolerant_drops_only_the_lossy_decimal(rows, bad_at):
    """A decimal needing scale 3 is inconvertible at (9,2): tolerant
    mode drops that row and ONLY that row (no silent rounding —
    decimal_utils.rs validation semantics)."""
    bad_at = min(bad_at, len(rows) - 1)
    b = _batch(rows)
    prices = b["price"].to_pylist()
    prices[bad_at] = prices[bad_at] + "9"   # one more fractional digit
    b = b.drop_columns(["price"]).append_column(
        "price", pa.array(prices, pa.string()))
    rows = [r for i, r in enumerate(rows)
            if i != bad_at and -INT32 <= r[1] < INT32]
    got = JsonCdcParser(strict=False, cdc=False,
                        schema_list=SCHEMA_LIST)(b)
    assert got["image_id"].to_pylist() == [r[0] for r in rows]
