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
