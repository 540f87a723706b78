"""JSON row ingest (sources/json_ingest.py) — T6 analog of moonlink's
REST JSON->row converter (rest_ingest/json_converter.rs)."""

import base64
import json

import pyarrow as pa
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.sources.json_ingest import (JsonCdcParser, JsonRowError,
                                              append_json, ingest_cdc_json)
from moonlink_ray.sources.scan import scan_arrow


def _row_json(i, op=None, lsn=None):
    row = synth.build_rows([i]).to_pylist()[0]
    row["bytes"] = base64.b64encode(row["bytes"]).decode()
    if op is not None:
        row["_op"], row["_lsn"] = op, lsn
    return row


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


@pytest.mark.usefixtures("ray_session")
def test_append_json_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 20, rows_per_fragment=8)
    p = _write_jsonl(tmp_path / "rows.jsonl",
                     [_row_json(1000 + i) for i in range(7)])
    snap = append_json(root, p)
    assert snap.total_rows == 27
    got = scan_arrow(root, sort_by="image_id")
    want = synth.build_rows([1000]).to_pylist()[0]
    match = got.filter(
        pa.compute.equal(got["image_id"], want["image_id"])).to_pylist()[0]
    assert match["bytes"] == want["bytes"]
    assert match["caption"] == want["caption"]


@pytest.mark.usefixtures("ray_session")
def test_ingest_cdc_json_merges(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 20, rows_per_fragment=8)
    base_lsn = load(root).max_lsn
    rows = [
        _row_json(2000, op="insert", lsn=base_lsn + 1),
        _row_json(0, op="upsert", lsn=base_lsn + 2),     # replaces img 0
        {"image_id": synth.image_id(1), "_op": "delete",
         "_lsn": base_lsn + 3},                           # deletes img 1
    ]
    p = _write_jsonl(tmp_path / "cdc.jsonl", rows)
    snap = ingest_cdc_json(root, p)
    assert snap.total_rows == 20  # +1 insert, -1 delete
    got = scan_arrow(root, sort_by="image_id")
    ids = set(got["image_id"].to_pylist())
    assert synth.image_id(2000) in ids and synth.image_id(1) not in ids
    # the staged CDC parquet was cleaned up
    from moonlink_ray.fs import for_root
    assert not any(n.startswith("cdc-json-")
                   for n in for_root(root).listdir("tmp"))


def test_parser_strict_rejects_bad_rows():
    bad_op = pa.table({"image_id": ["img-a"], "_op": ["frobnicate"],
                       "_lsn": [1]})
    with pytest.raises(JsonRowError, match="bad _op"):
        JsonCdcParser(strict=True, cdc=True)(bad_op)
    bad_b64 = pa.table({"image_id": ["img-a"], "_op": ["insert"],
                        "_lsn": [1], "bytes": ["!!not-base64!!"]})
    with pytest.raises(JsonRowError, match="base64"):
        JsonCdcParser(strict=True, cdc=True)(bad_b64)
    missing = pa.table({"caption": ["x"]})
    with pytest.raises(JsonRowError, match="image_id"):
        JsonCdcParser(strict=True, cdc=True)(missing)


def test_parser_tolerant_drops_bad_rows():
    mixed = pa.table({
        "image_id": ["img-a", "img-b", "img-c"],
        "_op": ["insert", "frobnicate", "delete"],
        "_lsn": [1, 2, 3],
    })
    out = JsonCdcParser(strict=False, cdc=True)(mixed)
    assert out.num_rows == 2
    assert out["image_id"].to_pylist() == ["img-a", "img-c"]
    assert out.schema.equals(synth.CDC_SCHEMA)


@pytest.mark.usefixtures("ray_session")
def test_json_ingest_honors_altered_schema(tmp_path):
    """ALTER ADD then JSON-append rows carrying the new column: typed
    values land; ALTER DROP then a row carrying the dropped column:
    strict rejects, tolerant drops the field but keeps the row
    (json_converter.rs:34-200 typed-conversion analog)."""
    from moonlink_ray.schema import alter_table

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 10, rows_per_fragment=8)
    alter_table(root, add=[("quality_score", "float64"),
                           ("ingested_at", "timestamp[us]")])

    row = _row_json(500)
    row["quality_score"] = 0.875
    row["ingested_at"] = "2026-08-18T12:34:56"
    p = _write_jsonl(tmp_path / "new.jsonl", [row])
    append_json(root, p)
    got = scan_arrow(root)
    match = got.filter(
        pa.compute.equal(got["image_id"], synth.image_id(500))).to_pylist()[0]
    assert match["quality_score"] == 0.875
    import datetime
    assert match["ingested_at"] == datetime.datetime(2026, 8, 18, 12, 34, 56)
    # pre-ALTER rows scan as null in the added columns
    old = got.filter(
        pa.compute.equal(got["image_id"], synth.image_id(0))).to_pylist()[0]
    assert old["quality_score"] is None

    # drop a column, then try to ingest it again
    alter_table(root, drop=["quality_score"])
    row2 = _row_json(501)
    row2["quality_score"] = 0.5
    p2 = _write_jsonl(tmp_path / "dropped.jsonl", [row2])
    with pytest.raises(Exception, match="quality_score"):
        append_json(root, p2, strict=True)
    snap = append_json(root, p2, strict=False)
    got2 = scan_arrow(root, columns=["image_id"])
    assert synth.image_id(501) in set(got2["image_id"].to_pylist())
    assert "quality_score" not in scan_arrow(root).column_names
    assert snap.total_rows == 12


def test_parser_typed_conversion_errors():
    """Lossy numeric casts are rejected in strict mode and row-masked in
    tolerant mode."""
    sch = [["image_id", "string"], ["score", "int32"]]
    bad = pa.table({"image_id": ["a", "b"], "score": [1.0, 2.5]})
    with pytest.raises(JsonRowError, match="score"):
        JsonCdcParser(strict=True, cdc=False, schema_list=sch)(bad)
    out = JsonCdcParser(strict=False, cdc=False, schema_list=sch)(bad)
    assert out["image_id"].to_pylist() == ["a"]
    assert out["score"].to_pylist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_json_ingest_parametric_types(tmp_path):
    """ALTER-added decimal128 / date32 / list<float32> columns ingest
    from JSON with typed validation — the breadth of moonlink's JSON
    converter (rest_ingest/json_converter.rs:34-200, decimal_utils.rs:
    decimals validated against precision/scale, date/time parsing,
    nested lists)."""
    from decimal import Decimal

    from moonlink_ray.schema import alter_table

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 10, rows_per_fragment=8)
    alter_table(root, add=[("price", "decimal128(10,2)"),
                           ("shot_date", "date32"),
                           ("embed", "list<float32>")])

    rows = []
    for i in range(3):
        r = _row_json(2000 + i)
        r["price"] = f"{i}.25"          # string -> validated decimal
        r["shot_date"] = f"2026-08-{10 + i:02d}"
        r["embed"] = [0.5 * i, 1.5]
        rows.append(r)
    p = _write_jsonl(tmp_path / "typed.jsonl", rows)
    snap = append_json(root, p)
    got = scan_arrow(root, snapshot=snap, sort_by="image_id")
    newest = got.slice(got.num_rows - 3)
    assert newest["price"].to_pylist() == [Decimal("0.25"), Decimal("1.25"),
                                           Decimal("2.25")]
    assert [d.isoformat() for d in newest["shot_date"].to_pylist()] == \
        ["2026-08-10", "2026-08-11", "2026-08-12"]
    assert newest["embed"].to_pylist() == [[0.0, 1.5], [0.5, 1.5], [1.0, 1.5]]
    # old rows are null-filled for all three ALTERed columns
    assert got["price"].null_count == 10

    # strict mode: a decimal that cannot be represented at scale 2 is a
    # per-field typed error, not a silent NULL (decimal_utils.rs
    # validation analog). Parser invoked directly — through Ray the
    # same JsonRowError arrives wrapped in RayTaskError.
    from moonlink_ray.schema import schema_to_list, table_schema
    parser = JsonCdcParser(strict=True, cdc=False,
                           schema_list=schema_to_list(
                               table_schema(load(root))))
    bad = pa.table({"image_id": ["img-x"], "price": ["1.999"]})
    with pytest.raises(JsonRowError, match="price"):
        parser(bad)
    # tolerant mode: the lossy decimal row is dropped, not corrupted
    parser_tol = JsonCdcParser(strict=False, cdc=False,
                               schema_list=schema_to_list(
                                   table_schema(load(root))))
    assert parser_tol(bad).num_rows == 0


def test_parser_decimal_requires_json_string():
    """A JSON *number* for a decimal column is a TypeMismatch, exactly as
    in the reference (json_converter.rs:133-146 accepts only strings for
    Decimal128 — a binary double has no exact decimal identity). Strict
    raises; tolerant drops only rows that actually carry a value."""
    sch = [["image_id", "string"], ["price", "decimal128(9,2)"]]
    bad = pa.table({"image_id": ["a", "b"],
                    "price": pa.array([1.25, None], pa.float64())})
    with pytest.raises(JsonRowError, match="price.*strings"):
        JsonCdcParser(strict=True, cdc=False, schema_list=sch)(bad)
    out = JsonCdcParser(strict=False, cdc=False, schema_list=sch)(bad)
    assert out["image_id"].to_pylist() == ["b"]    # null decimal survives
    assert out["price"].to_pylist() == [None]
    # the same rule applies through list nesting
    sch = [["image_id", "string"], ["prices", "list<decimal128(9,2)>"]]
    bad = pa.table({"image_id": ["a"],
                    "prices": pa.array([[1.25]], pa.list_(pa.float64()))})
    with pytest.raises(JsonRowError, match="prices.*strings"):
        JsonCdcParser(strict=True, cdc=False, schema_list=sch)(bad)
    good = pa.table({"image_id": ["a"],
                     "prices": pa.array([["1.25", "3.00"]],
                                        pa.list_(pa.string()))})
    out = JsonCdcParser(strict=True, cdc=False, schema_list=sch)(good)
    from decimal import Decimal
    assert out["prices"].to_pylist() == [[Decimal("1.25"), Decimal("3.00")]]


def test_parser_nested_list_conversion():
    """list<list<int32>> converts recursively with element validation —
    the reference's nested-list path (json_converter.rs:153-184,
    indexed error paths like nested_list.item[1].item[0])."""
    sch = [["image_id", "string"], ["grid", "list<list<int32>>"]]
    good = pa.table({"image_id": ["a", "b"],
                     "grid": pa.array([[[1, 2], [3]], None],
                                      pa.list_(pa.list_(pa.int64())))})
    out = JsonCdcParser(strict=True, cdc=False, schema_list=sch)(good)
    assert out["grid"].to_pylist() == [[[1, 2], [3]], None]
    assert out.schema.field("grid").type == pa.list_(pa.list_(pa.int32()))
    # an element overflowing int32 is a typed error, not silent wrap
    bad = pa.table({"image_id": ["a"],
                    "grid": pa.array([[[2**40]]],
                                     pa.list_(pa.list_(pa.int64())))})
    with pytest.raises(JsonRowError, match="grid"):
        JsonCdcParser(strict=True, cdc=False, schema_list=sch)(bad)
    assert JsonCdcParser(strict=False, cdc=False,
                         schema_list=sch)(bad).num_rows == 0


def test_schema_struct_name_round_trip():
    """struct<...> joins the serializable vocabulary: name -> type ->
    name is identity through arbitrary nesting (the converter breadth
    of rest_ingest/json_converter.rs:34-200 includes nested structs)."""
    from moonlink_ray.schema import type_from_name, type_to_name
    names = [
        "struct<a:int64,b:string>",
        "struct<d:decimal128(10,2),v:list<float32>>",
        "list<struct<x:int32,y:struct<z:timestamp[us]>>>",
        "struct<outer:list<struct<a:int64,b:list<string>>>,flag:bool>",
    ]
    for n in names:
        t = type_from_name(n)
        assert type_to_name(t) == n, n
    with pytest.raises(ValueError, match="struct"):
        type_from_name("struct<>")
    with pytest.raises(ValueError, match="name:type"):
        type_from_name("struct<missingcolon>")


def test_parser_struct_column_null_fills_missing_fields():
    """Struct values convert field-by-field: absent fields null-fill,
    extra fields drop, leaf casts validate — the JSON converter's
    nested-field walk (json_converter.rs:34-200)."""
    sch = [["image_id", "string"],
           ["meta", "struct<w:int32,h:int32,tag:string>"]]
    src = pa.table({
        "image_id": ["a", "b", "c"],
        "meta": pa.array([{"w": 4, "h": 3, "tag": "x", "junk": 9},
                          {"w": 7},            # h/tag absent -> null
                          None])})             # whole struct null
    out = JsonCdcParser(strict=True, cdc=False, schema_list=sch)(src)
    assert out["meta"].to_pylist() == [
        {"w": 4, "h": 3, "tag": "x"},
        {"w": 7, "h": None, "tag": None},
        None]
    assert out.schema.field("meta").type == pa.struct(
        [("w", pa.int32()), ("h", pa.int32()), ("tag", pa.string())])


def test_parser_struct_decimal_requires_json_string():
    """The decimal-needs-a-string rule recurses into struct fields."""
    sch = [["image_id", "string"],
           ["pay", "struct<amount:decimal128(9,2),cur:string>"]]
    bad = pa.table({
        "image_id": ["a"],
        "pay": pa.array([{"amount": 1.25, "cur": "usd"}])})
    with pytest.raises(JsonRowError, match="pay.*strings"):
        JsonCdcParser(strict=True, cdc=False, schema_list=sch)(bad)
    good = pa.table({
        "image_id": ["a"],
        "pay": pa.array([{"amount": "1.25", "cur": "usd"}])})
    out = JsonCdcParser(strict=True, cdc=False, schema_list=sch)(good)
    from decimal import Decimal
    assert out["pay"].to_pylist() == [
        {"amount": Decimal("1.25"), "cur": "usd"}]


def test_parser_struct_tolerant_masks_lossy_rows():
    """Tolerant mode drops only the rows whose struct leaves cannot
    convert losslessly."""
    sch = [["image_id", "string"], ["m", "struct<n:int32>"]]
    src = pa.table({
        "image_id": ["a", "b"],
        "m": pa.array([{"n": 1.0}, {"n": 2.5}])})   # 2.5 is lossy
    out = JsonCdcParser(strict=False, cdc=False, schema_list=sch)(src)
    assert out["image_id"].to_pylist() == ["a"]
    assert out["m"].to_pylist() == [{"n": 1}]


@pytest.mark.usefixtures("ray_session")
def test_json_ingest_struct_column_end_to_end(tmp_path):
    """ALTER-add a struct column, JSON-append rows (some omitting
    nested fields), scan it back typed; the Iceberg export publishes
    nested field-ids for it."""
    from moonlink_ray.schema import alter_table

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 10, rows_per_fragment=8)
    alter_table(root, add=[
        ("exif", "struct<iso:int32,lens:string,gps:list<float64>>")])

    rows = []
    for i in range(3):
        r = _row_json(3000 + i)
        r["exif"] = ({"iso": 100 * (i + 1), "lens": f"L{i}",
                      "gps": [1.0 * i, 2.0]} if i < 2
                     else {"iso": 800})      # row 2 omits lens/gps
        rows.append(r)
    p = _write_jsonl(tmp_path / "structs.jsonl", rows)
    snap = append_json(root, p)
    got = scan_arrow(root, snapshot=snap, sort_by="image_id")
    newest = got.slice(got.num_rows - 3)["exif"].to_pylist()
    assert newest == [
        {"iso": 100, "lens": "L0", "gps": [0.0, 2.0]},
        {"iso": 200, "lens": "L1", "gps": [1.0, 2.0]},
        {"iso": 800, "lens": None, "gps": None}]
    assert got["exif"].null_count == 10      # pre-ALTER rows null-fill

    # iceberg schema JSON: every nested field/element carries an id
    from moonlink_ray.iceberg import _iceberg_schema
    from moonlink_ray.schema import schema_to_list, table_schema
    sj = _iceberg_schema(schema_to_list(table_schema(load(root))))
    exif = next(f for f in sj["fields"] if f["name"] == "exif")
    assert exif["type"]["type"] == "struct"
    ids = [f["id"] for f in exif["type"]["fields"]]
    gps = next(f for f in exif["type"]["fields"] if f["name"] == "gps")
    assert gps["type"]["element-id"] not in ids
    assert sj["last-column-id"] >= max(ids + [gps["type"]["element-id"]])
