"""Config-time projection helpers (SURVEY §2.8 F5/F6)."""

from mysql2es_spark.operators.project import index_name_of, snake_to_camel


def test_index_name_of():
    # README-EN.org:93-95: t_some_one ==> some-one, lowercase since ES 6.0
    assert index_name_of("t_some_one") == "some-one"
    assert index_name_of("t_order") == "order"
    assert index_name_of("T_Order_Item".lower()) == "order-item"
    assert index_name_of("plain") == "plain"        # no t_ prefix to strip
    assert index_name_of("t_Order_X") == "order-x"  # lowercased


def test_snake_to_camel():
    assert snake_to_camel("user_name") == "userName"
    assert snake_to_camel("c_type") == "cType"
    assert snake_to_camel("already") == "already"


def test_derive_index_schema_type_table():
    """The scheme:true DDL->index-type table (README-EN.org:181-250)."""
    from pyspark.sql import types as T

    from mysql2es_spark.plans.manifest import derive_index_schema

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("price", T.DecimalType(18, 2)),
        T.StructField("created", T.TimestampType()),
        T.StructField("item", T.ArrayType(T.StructType([
            T.StructField("sku_id", T.LongType()),
            T.StructField("sku_desc", T.StringType()),
        ]))),
    ])
    m = derive_index_schema(schema)["properties"]
    assert m["id"] == {"type": "long"}
    assert m["qty"] == {"type": "integer"}
    assert m["name"]["type"] == "keyword"
    assert m["name"]["normalizer"]["filter"] == ["trim", "lowercase"]
    assert m["content"] == {"type": "text", "analyzer": "code"}
    assert m["price"] == {"type": "double"}
    assert m["created"]["type"] == "date"
    assert "epoch_millis" in m["created"]["format"]
    assert m["item"]["type"] == "nested"
    assert m["item"]["properties"]["sku_id"] == {"type": "long"}
    assert m["item"]["properties"]["sku_desc"]["type"] == "keyword"


def test_manifest_roundtrip_file_uri(tmp_path):
    """Index roots are location-transparent now (VERDICT r2 #1): a
    file:// URI publishes and loads through the FS interface."""
    from mysql2es_spark.plans.manifest import Manifest, load_current, publish

    root = "file://" + str(tmp_path / "idx")
    m = Manifest(version=1, n_buckets=4, block_size=64, chunk_span=256)
    publish(root, m)
    back = load_current(root)
    assert back is not None and back.version == 1 and back.n_buckets == 4
