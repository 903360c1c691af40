import pathlib

import pytest

from transformers4rec_tpu.schema import (
    ColumnSchema,
    Schema,
    Tags,
    ValueCount,
    get_embedding_size_from_cardinality,
)

REES46_PBTXT = pathlib.Path(
    "/root/reference/examples/t4rec_paper_experiments/datasets_configs/ecom_rees46/rees46_schema.pbtxt"
)


def make_schema():
    return Schema(
        [
            ColumnSchema.create_categorical(
                "item_id", num_items=1000, min_index=1,
                value_count=ValueCount(2, 20), tags=[Tags.ITEM_ID],
            ),
            ColumnSchema.create_categorical(
                "category", num_items=50, min_index=1,
                value_count=ValueCount(2, 20), tags=[Tags.ITEM],
            ),
            ColumnSchema.create_continuous(
                "price", min_value=0.0, max_value=1.0, value_count=ValueCount(2, 20)
            ),
        ]
    )


def test_select_by_tag():
    s = make_schema()
    assert s.select_by_tag(Tags.CATEGORICAL).column_names == ["item_id", "category"]
    assert s.select_by_tag("continuous").column_names == ["price"]
    assert s.remove_by_tag(Tags.CONTINUOUS).column_names == ["item_id", "category"]


def test_select_by_name_and_algebra():
    s = make_schema()
    assert s.select_by_name(["price"]).column_names == ["price"]
    assert (s - s.select_by_name("price")).column_names == ["item_id", "category"]
    merged = s.select_by_name("item_id") + s.select_by_name("category")
    assert merged.column_names == ["item_id", "category"]


def test_item_id_and_cardinalities():
    s = make_schema()
    assert s.item_id_column_name == "item_id"
    cards = s.categorical_cardinalities()
    assert cards["item_id"] == 1001  # int_domain.max + 1
    assert cards["category"] == 51
    assert s.sequence_length() == 20


def test_embedding_size_heuristic():
    # ceil(card^0.25 * multiplier): same rule as the reference's embedding_utils
    assert get_embedding_size_from_cardinality(10000, 2.0) == 20
    assert get_embedding_size_from_cardinality(390001, 3.0) == 75


def test_proto_text_roundtrip():
    s = make_schema()
    text = s.to_proto_text()
    s2 = Schema.from_proto_text(text)
    assert s2.column_names == s.column_names
    assert s2.categorical_cardinalities() == s.categorical_cardinalities()
    assert s2["item_id"].tags == s["item_id"].tags
    assert s2["price"].float_domain.max == 1.0


def test_json_roundtrip(tmp_path):
    s = make_schema()
    path = tmp_path / "schema.json"
    s.to_json_file(str(path))
    s2 = Schema.from_json(str(path))
    assert s2.column_names == s.column_names
    assert s2["item_id"].value_count.max == 20
    assert s2["item_id"].int_domain.is_categorical


@pytest.mark.skipif(not REES46_PBTXT.exists(), reason="reference not mounted")
def test_parse_reference_rees46_pbtxt():
    s = Schema.from_proto_text(str(REES46_PBTXT))
    assert "sess_pid_seq" in s.column_names
    assert s.item_id_column_name == "sess_pid_seq"
    assert s.categorical_cardinalities()["sess_pid_seq"] == 390001
    assert s["sess_pid_seq"].value_count.max == 20


def test_parse_reference_testing_schema_json():
    path = pathlib.Path("/root/reference/transformers4rec/data/testing/schema.json")
    if not path.exists():
        pytest.skip("reference not mounted")
    s = Schema.from_json(str(path))
    assert len(s) > 3
    cont = s.select_by_tag(Tags.CONTINUOUS)
    assert len(cont) > 0


_DATASET_CONFIGS = pathlib.Path(
    "/root/reference/examples/t4rec_paper_experiments/datasets_configs"
)


@pytest.mark.skipif(not _DATASET_CONFIGS.exists(), reason="reference not mounted")
@pytest.mark.parametrize(
    "rel, item_col",
    [
        ("ecom_rees46/rees46_schema.pbtxt", "sess_pid_seq"),
        ("ecom_yoochoose/yoochoose_schema.pbtxt", None),
        ("news_g1/g1_schema.pbtxt", None),
        ("news_adressa/adressa_schema.pbtxt", None),
    ],
)
def test_parse_all_reference_dataset_schemas(rel, item_col):
    """Every paper dataset config (SURVEY.md §2 #37) must load unchanged and
    expose an ITEM_ID column, cardinalities, and a model buildable via
    TabularSequenceFeatures.from_schema."""
    s = Schema.from_proto_text(str(_DATASET_CONFIGS / rel))
    assert len(s) >= 1
    iid = s.item_id_column_name
    assert iid, f"no item_id column found in {rel}"
    if item_col:
        assert iid == item_col
    cards = s.categorical_cardinalities()
    assert cards[iid] > 1000
    assert s[iid].value_count.max >= 2

    # schema-driven model construction end-to-end (shapes only, CPU)
    import transformers4rec_tpu as tr

    im = tr.TabularSequenceFeatures.from_schema(
        s.select_by_name(iid), d_output=16, masking="clm", aggregation="concat"
    )
    assert im is not None
