"""modifier.Field action fixtures re-expressed as DataFrame assertions.

Source: /root/reference/tests/modifier/TestModifyFields.py:14-149 and
FIXTURES.md F5.
"""

from pyspark.sql import functions as F

from lumbermill_spark.operators import field_actions as fa


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_delete(spark):
    df = _df(spark, [(1, "x")], "delme int, keepme string")
    out = fa.apply_action(df, "delete", source_fields=["delme"])
    assert out.columns == ["keepme"]


def test_keep_preserves_meta(spark):
    df = _df(spark, [("d1", "a", "b", "c")],
             "doc_id string, keepthis string, keepthat string, dropthis string")
    out = fa.apply_action(df, "keep", source_fields=["keepthis", "keepthat"])
    assert set(out.columns) == {"doc_id", "keepthis", "keepthat"}


def test_concat(spark):
    df = _df(spark, [("Johann", "Gambolputty")], "first string, last string")
    out = fa.apply_action(df, "concat", source_fields=["first", "last", "missing"],
                          target_field="Name")
    assert out.first()["Name"] == "JohannGambolputty"


def test_insert_dynamic(spark):
    df = _df(spark, [("Johann", "Gambolputty")], "first string, last string")
    out = fa.apply_action(df, "insert", target_field="Name",
                          value="$(first) $(last) de von Ausfern")
    assert out.first()["Name"] == "Johann Gambolputty de von Ausfern"


def test_insert_copies_existing_field(spark):
    # Field.py:405-416: value naming an existing field copies that field
    df = _df(spark, [("Johann",)], "first string")
    out = fa.apply_action(df, "insert", target_field="copy", value="first")
    assert out.first()["copy"] == "Johann"


def test_upper_lower(spark):
    df = _df(spark, [("Johann",)], "first string")
    up = fa.apply_action(df, "upper", source_fields=["first"])
    assert up.first()["first"] == "JOHANN"
    low = fa.apply_action(up, "lower", source_fields=["first"],
                          target_fields=["first_lower"])
    row = low.first()
    assert row["first"] == "JOHANN" and row["first_lower"] == "johann"


def test_slice(spark):
    df = _df(spark, [("Gambolputty",)], "last string")
    out = fa.apply_action(df, "slice", source_field="last", start=6)
    assert out.first()["last"] == "putty"
    out2 = fa.apply_action(df, "slice", source_field="last", start=0, end=-5,
                           target_field="head")
    assert out2.first()["head"] == "Gambol"


def test_replace_regex(spark):
    df = _df(spark, [("The Spanish Inquisition",)], "s string")
    out = fa.apply_action(df, "replace", source_field="s",
                          regex="Sp.*?sh", **{"with": "English"})
    assert out.first()["s"] == "The English Inquisition"


def test_string_replace_counted(spark):
    df = _df(spark, [("aaa",)], "s string")
    out = fa.apply_action(df, "string_replace", source_field="s",
                          old="a", new="b", max=2)
    assert out.first()["s"] == "bba"
    out_all = fa.apply_action(df, "string_replace", source_field="s",
                              old="a", new="b")
    assert out_all.first()["s"] == "bbb"


def test_map(spark):
    df = _df(spark, [("100",), ("300",)], "http_status string")
    out = fa.apply_action(df, "map", source_field="http_status",
                          map={100: "Continue", 200: "OK"})
    rows = {r["http_status"]: r["http_status_mapped"] for r in out.collect()}
    assert rows["100"] == "Continue"
    assert rows["300"] is None
    kept = fa.apply_action(df, "map", source_field="http_status",
                           map={100: "Continue"}, keep_unmappable=True)
    rows = {r["http_status"]: r["http_status_mapped"] for r in kept.collect()}
    assert rows["300"] == "300"


def test_key_value(spark):
    df = _df(spark, [("k1=v1&k2=v2",)], "qs string")
    out = fa.apply_action(df, "key_value", source_field="qs",
                          kv_separator="=", line_separator="&",
                          prefix="q_")
    m = out.first()["qs_kv"]
    assert m == {"q_k1": "v1", "q_k2": "v2"}


def test_key_value_regex(spark):
    df = _df(spark, [("a=1&b=2",)], "qs string")
    out = fa.apply_action(df, "key_value_regex", source_field="qs",
                          regex=r"([^=&?]+)=([^&=?]+)")
    assert out.first()["qs_kv"] == {"a": "1", "b": "2"}


def test_split_and_split_list(spark):
    df = _df(spark, [("a;b;c",)], "s string")
    out = fa.apply_action(df, "split", source_field="s", separator=";")
    assert list(out.first()["s"]) == ["a", "b", "c"]
    n = fa.apply_action(out, "split_list", source_field="s").count()
    assert n == 3


def test_split_literal_separator(spark):
    # reference separator is a literal string, not a regex (Field.py:648)
    df = _df(spark, [("a.b.c",)], "s string")
    out = fa.apply_action(df, "split", source_field="s", separator=".")
    assert list(out.first()["s"]) == ["a", "b", "c"]


def test_strip_merge_join(spark):
    df = _df(spark, [("  x  ", "y")], "a string, b string")
    out = fa.apply_action(df, "strip", source_field="a")
    assert out.first()["a"] == "x"
    out = fa.apply_action(out, "merge", source_fields=["a", "b"],
                          target_field="m")
    assert list(out.first()["m"]) == ["x", "y"]
    out = fa.apply_action(out, "join", source_field="m", target_field="j",
                          separator="-")
    assert out.first()["j"] == "x-y"


def test_cast_to_int_error_is_zero(spark):
    # Field.py:762-773: int goes via float, bad value -> 0
    df = _df(spark, [("3",), ("2.9",), ("not a number",)], "v string")
    out = fa.apply_action(df, "cast_to_int", source_fields=["v"])
    assert sorted(r["v"] for r in out.collect()) == [0, 2, 3]


def test_cast_to_float_error_is_zero(spark):
    df = _df(spark, [("3.5",), ("prose",)], "v string")
    vals = sorted(r["v"] for r in fa.apply_action(
        df, "cast_to_float", source_fields=["v"]).collect())
    assert vals == [0.0, 3.5]


def test_cast_to_bool(spark):
    df = _df(spark, [("x",), ("",)], "v string")
    vals = sorted(r["v"] for r in fa.apply_action(
        df, "cast_to_bool", source_fields=["v"]).collect())
    assert vals == [False, True]


def test_hash_md5_with_salt(spark):
    import hashlib
    df = _df(spark, [("value",)], "v string")
    out = fa.apply_action(df, "hash", source_fields=["v"],
                          target_fields=["v_hash"], algorithm="md5",
                          salt="pepper")
    expected = hashlib.md5(b"peppervalue").hexdigest()
    assert out.first()["v_hash"] == expected


def test_rename_and_rename_regex(spark):
    df = _df(spark, [(1, 2)], "old_a int, old_b int")
    out = fa.apply_action(df, "rename", source_field="old_a",
                          target_field="new_a")
    assert "new_a" in out.columns and "old_a" not in out.columns
    out = fa.apply_action(df, "rename_regex", regex="^old_", replace="")
    assert out.columns == ["a", "b"]
    out = fa.apply_action(df, "rename_replace", old="old", new="x")
    assert out.columns == ["x_a", "x_b"]
