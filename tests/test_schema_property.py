"""Properties of projection-on-read (schema.conform_table) — the
mechanism every scan applies under schema evolution: for ANY fragment
column set vs ANY active schema, the result has exactly the schema's
columns in schema order, shared columns keep their values, missing
ones are null, dropped ones are gone, and the operation is
idempotent."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from moonlink_ray.schema import conform_table

POOL = [("a", pa.string()), ("b", pa.int64()), ("c", pa.float64()),
        ("d", pa.int32()), ("e", pa.string())]

# min_size=1: a zero-column Arrow table cannot carry a row count, and
# neither side is ever empty in practice (fragments always have
# columns; ALTER refuses to drop the protected key columns)
subset = st.lists(st.sampled_from(range(len(POOL))), min_size=1,
                  max_size=len(POOL), unique=True)


def _table(idx, n):
    cols = {}
    for i in idx:
        name, typ = POOL[i]
        if pa.types.is_string(typ):
            vals = [f"{name}{j}" for j in range(n)]
        else:
            vals = list(range(n))
        cols[name] = pa.array(vals, typ)
    if not cols:
        return pa.table({"__dummy": pa.nulls(n, pa.int8())}).drop_columns(
            ["__dummy"])
    return pa.table(cols)


@settings(max_examples=300, deadline=None)
@given(frag=subset, active=subset, n=st.integers(min_value=0, max_value=8))
def test_conform_table_projects_exactly(frag, active, n):
    t = _table(frag, n)
    schema = pa.schema([POOL[i] for i in active])
    out = conform_table(t, schema, keep_extra=())
    assert out.column_names == [POOL[i][0] for i in active]
    assert out.num_rows == n
    for i in active:
        name, typ = POOL[i]
        assert out[name].type == typ
        if i in frag:
            assert out[name].to_pylist() == t[name].to_pylist()
        else:
            assert out[name].null_count == n
    # idempotent: conforming a conformed table is a no-op
    assert conform_table(out, schema, keep_extra=()).equals(out)
