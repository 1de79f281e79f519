"""Error-path goldens ported from the reference's own test suites
(/root/reference/test/json_schema/errors_test.clj:5-65 and
custom_extensions_test.clj) — exact instance-path asserts on the Python
backend (paths are the contract; messages are this engine's own)."""

from json_schema_clj_spark.pyvalidator.validator import validate


def first_error_path(schema, doc):
    return validate(schema, doc)["errors"][0]["path"]


def error_paths(schema, doc):
    return [e["path"] for e in validate(schema, doc)["errors"]]


# errors_test.clj schemas 1-5 (keyword keys → strings; array indices ints)

SCHEMA_1 = {
    "type": "object",
    "properties": {
        "p0": {"constant": 1},
        "p1": {"type": "object",
               "properties": {"p2": {"type": "object",
                                     "properties": {"p3": {"constant": 1}}}}},
    },
}

SCHEMA_2 = {
    "type": "object",
    "properties": {
        "p0": {"constant": 1},
        "p1": {"type": "array",
               "items": {"type": "object",
                         "properties": {"p2": {"type": "array",
                                               "items": {"constant": 1}}}}},
    },
}

SCHEMA_3 = {
    "properties": {"p0": {}},
    "patternProperties": {"a.*": {"properties": {},
                                  "patternProperties": {"b.*": {"constant": 1}},
                                  "additionalProperties": False}},
    "additionalProperties": False,
}

SCHEMA_4 = {
    "properties": {"p0": {}},
    "additionalProperties": {"properties": {},
                             "additionalProperties": {"constant": 1}},
}

SCHEMA_5 = {"properties": {"p0": {}, "p1": {"contains": {"constant": 1}}}}


def test_nested_properties_path():
    # errors_test.clj:43-45
    assert first_error_path(SCHEMA_1, {"p0": 1, "p1": {"p2": {"p3": 2}}}) == ["p1", "p2", "p3"]


def test_array_index_in_path():
    # errors_test.clj:47-49
    assert first_error_path(SCHEMA_2, {"p1": [{"p2": [1, 2]}]}) == ["p1", 0, "p2", 1]


def test_pattern_properties_paths():
    # errors_test.clj:51-57
    assert first_error_path(SCHEMA_3, {"a1": {"b1": 2}}) == ["a1", "b1"]
    assert first_error_path(SCHEMA_3, {"p0": 1, "a1": {"b1": 2}}) == ["a1", "b1"]


def test_additional_properties_schema_path():
    # errors_test.clj:59-61
    assert first_error_path(SCHEMA_4, {"p0": 1, "a1": {"b1": 2}}) == ["a1", "b1"]


def test_contains_path():
    # errors_test.clj:63-65
    assert first_error_path(SCHEMA_5, {"p0": 1, "p1": [2, 3]}) == ["p1"]


# custom_extensions_test.clj ports


def test_discriminator_paths():
    # custom_extensions_test.clj:9-40
    schema = {
        "discriminator": "resourceType",
        "definitions": {
            "User": {"properties": {"name": {"type": "string"}}, "required": ["name"]},
            "Role": {"properties": {"title": {"type": "string"}}, "required": ["title"]},
        },
    }
    assert validate(schema, {"resourceType": "User", "name": "n"})["errors"] == []
    assert error_paths(schema, {"resourceType": "User"}) == [[]]  # required at root
    errs = validate(schema, {"resourceType": "Ghost"})["errors"]
    assert "Could not resolve #/definitions/Ghost" in errs[0]["message"]


def test_exclusive_properties():
    # custom_extensions_test.clj:44-68
    schema = {"exclusiveProperties": [{"properties": ["animal", "vegetable"]}]}
    assert validate(schema, {"animal": 1})["errors"] == []
    assert validate(schema, {})["errors"] == []
    errs = validate(schema, {"animal": 1, "vegetable": 2})["errors"]
    assert "mutually exclusive" in errs[0]["message"]
    schema_req = {"exclusiveProperties": [{"properties": ["a", "b"], "required": True}]}
    errs = validate(schema_req, {})["errors"]
    assert "is required" in errs[0]["message"]


def test_required_vs_nil_issue_4():
    # custom_extensions_test.clj:130-140
    schema = {"required": ["name"]}
    assert validate(schema, {"name": "x"})["errors"] == []
    assert validate(schema, {"name": None})["errors"] != []
    assert validate(schema, {})["errors"] != []


def test_unknown_type_issue_1():
    # custom_extensions_test.clj:171-175
    errs = validate({"type": "zzz"}, 1)["errors"]
    assert errs and "Broken schema: unknown type" in errs[0]["message"]


def test_subset():
    # custom_extensions_test.clj:218-278
    schema = {
        "properties": {
            "allowed": {},
            "chosen": {"subset": {"$data": "1/allowed"}},
        }
    }
    assert validate(schema, {"allowed": ["a", "b", "c"], "chosen": ["a", "c"]})["errors"] == []
    errs = validate(schema, {"allowed": ["a", "b"], "chosen": ["a", "z"]})["errors"]
    assert errs and errs[0]["path"] == ["chosen"]


def test_recursive_ref_paths():
    # custom_extensions_test.clj:280-334 (ref_props shape)
    schema = {
        "definitions": {
            "Ref": {"type": "object",
                    "properties": {"id": {"type": "string"},
                                   "ref": {"$ref": "#/definitions/Ref"}},
                    "required": ["id"]}
        },
        "$ref": "#/definitions/Ref",
    }
    assert validate(schema, {"id": "a", "ref": {"id": "b", "ref": {"id": "c"}}})["errors"] == []
    errs = validate(schema, {"id": "a", "ref": {"ref": {"id": "c"}}})["errors"]
    assert [e["path"] for e in errs] == [["ref"]]


def test_warnings_config_routing():
    # custom_extensions_test.clj:91-128
    schema = {"properties": {"x": {"type": "integer"}}}
    res = validate(schema, {"x": "nope"}, config={"integer": "warnings"})
    assert res["errors"] == []
    assert [w["path"] for w in res["warnings"]] == [["x"]]


def test_deferreds_golden():
    # custom_extensions_test.clj:83-89, 177-216
    schema = {
        "properties": {
            "a": {"deferred": {"validator": "custom-a"}},
            "b": {"items": {"deferred": True}},
        }
    }
    res = validate(schema, {"a": 1, "b": [10, 20]})
    assert res["errors"] == []
    assert res["deferreds"] == [
        {"path": ["a"], "value": 1, "deferred": {"validator": "custom-a"}},
        {"path": ["b", 0], "value": 10, "deferred": True},
        {"path": ["b", 1], "value": 20, "deferred": True},
    ]
