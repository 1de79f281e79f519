"""Generate draft-suite conformance fixtures (tests/fixtures/draft{3,4,6,7}).

The reference's official JSON-Schema-Test-Suite submodule is EMPTY in this
checkout (/root/reference/.gitmodules:1-3, no content), so the draft
fixtures are authored here in the same format, pinned to the REFERENCE
engine's behavior — including its deliberate quirks (blank strings are not
valid strings, 1.0 is not an integer, nil counts as missing for required).
Cases the reference's own skip-lists exclude (ECMA-262 regex dialect,
numeric-type unification, ref-overrides-siblings, multiple extends, array
of schemas for items in draft3's sense, allOf with base schema) are not
generated in the official suite's form — but where the reference's focus
tests pin its ALTERNATE behavior on a skipped boundary (multiple-extends
merge, JVM regex dialect, $ref-with-siblings), draft3 carries authored
groups pinned to that focus-test behavior (extends.json,
format_regex_dialect.json, ref_siblings.json).

Run: python tools/gen_draft_fixtures.py   (writes JSON, idempotent)
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def g(description, schema, *tests):
    return {
        "description": description,
        "schema": schema,
        "tests": [{"description": d, "data": v, "valid": ok} for d, v, ok in tests],
    }


DRAFT4 = {
    "type.json": [
        g("integer type matches integers", {"type": "integer"},
          ("an integer is an integer", 1, True),
          ("a float is not an integer", 1.1, False),
          ("a float with zero fraction is not an integer (reference quirk)", 1.0, False),
          ("a string is not an integer", "foo", False),
          ("a boolean is not an integer", True, False),
          ("null is not an integer", None, False),
          ("an array is not an integer", [1], False),
          ("an object is not an integer", {}, False)),
        g("number type matches numbers", {"type": "number"},
          ("an integer is a number", 1, True),
          ("a float is a number", 1.1, True),
          ("a string is not a number", "foo", False),
          ("a boolean is not a number", True, False),
          ("null is not a number", None, False)),
        g("string type matches strings", {"type": "string"},
          ("a string is a string", "foo", True),
          ("a blank string is not a valid string (reference quirk)", "", False),
          ("a whitespace string is not a valid string (reference quirk)", "   ", False),
          ("an integer is not a string", 1, False),
          ("null is not a string", None, False)),
        g("object type matches objects", {"type": "object"},
          ("an object is an object", {}, True),
          ("an array is not an object", [], False),
          ("a string is not an object", "foo", False)),
        g("array type matches arrays", {"type": "array"},
          ("an array is an array", [], True),
          ("an object is not an array", {}, False),
          ("a string is not an array", "foo", False)),
        g("boolean type matches booleans", {"type": "boolean"},
          ("true is a boolean", True, True),
          ("false is a boolean", False, True),
          ("an integer is not a boolean", 1, False),
          ("zero is not a boolean", 0, False)),
        g("null type matches only null", {"type": "null"},
          ("null is null", None, True),
          ("a float is not null", 1.1, False),
          ("zero is not null", 0, False),
          ("false is not null", False, False),
          ("an empty string is not null", "", False)),
        g("multiple types can be specified in an array", {"type": ["integer", "string"]},
          ("an integer is valid", 1, True),
          ("a string is valid", "foo", True),
          ("a float is invalid", 1.1, False),
          ("an object is invalid", {}, False)),
    ],
    "enum.json": [
        g("simple enum validation", {"enum": [1, 2, 3]},
          ("one of the enum is valid", 1, True),
          ("something else is invalid", 4, False),
          ("a float twin is invalid (strict numeric identity)", 1.0, False)),
        g("heterogeneous enum validation", {"enum": [6, "foo", [], True, {"foo": 12}]},
          ("one of the enum is valid", [], True),
          ("something else is invalid", None, False),
          ("objects are deep compared", {"foo": False}, False),
          ("deep-equal object is valid", {"foo": 12}, True)),
        g("enums in properties", {
            "type": "object",
            "properties": {"foo": {"enum": ["foo"]}, "bar": {"enum": ["bar"]}},
            "required": ["bar"]},
          ("both properties are valid", {"foo": "foo", "bar": "bar"}, True),
          ("missing optional property is valid", {"bar": "bar"}, True),
          ("missing required property is invalid", {"foo": "foo"}, False),
          ("wrong foo value is invalid", {"foo": "foot", "bar": "bar"}, False)),
    ],
    "minimum.json": [
        g("minimum validation", {"minimum": 1.1},
          ("above the minimum is valid", 2.6, True),
          ("boundary point is valid", 1.1, True),
          ("below the minimum is invalid", 0.6, False),
          ("ignores non-numbers", "x", True)),
        g("exclusiveMinimum validation", {"minimum": 1.1, "exclusiveMinimum": True},
          ("above the minimum is still valid", 1.2, True),
          ("boundary point is invalid", 1.1, False)),
    ],
    "maximum.json": [
        g("maximum validation", {"maximum": 3.0},
          ("below the maximum is valid", 2.6, True),
          ("boundary point is valid", 3.0, True),
          ("above the maximum is invalid", 3.5, False),
          ("ignores non-numbers", "x", True)),
        g("exclusiveMaximum validation", {"maximum": 3.0, "exclusiveMaximum": True},
          ("below the maximum is still valid", 2.2, True),
          ("boundary point is invalid", 3.0, False)),
    ],
    "multipleOf.json": [
        g("by int", {"multipleOf": 2},
          ("int by int", 10, True),
          ("int by int fail", 7, False),
          ("ignores non-numbers", "foo", True)),
        g("by number", {"multipleOf": 1.5},
          ("zero is multiple of anything", 0, True),
          ("4.5 is multiple of 1.5", 4.5, True),
          ("35 is not multiple of 1.5", 35, False)),
        g("by small number", {"multipleOf": 0.0001},
          ("0.0075 is multiple of 0.0001", 0.0075, True),
          ("0.00751 is not multiple of 0.0001", 0.00751, False)),
    ],
    "maxLength.json": [
        g("maxLength validation", {"maxLength": 2},
          ("shorter is valid", "f", True),
          ("exact length is valid", "fo", True),
          ("too long is invalid", "foo", False),
          ("ignores non-strings", 100, True),
          ("counts codepoints not bytes", "\U0001F600\U0001F600", True)),
    ],
    "minLength.json": [
        g("minLength validation", {"minLength": 2},
          ("longer is valid", "foo", True),
          ("exact length is valid", "fo", True),
          ("too short is invalid", "f", False),
          ("ignores non-strings", 1, True),
          ("one supplementary-plane codepoint is too short", "\U0001F600", False)),
    ],
    "pattern.json": [
        g("pattern validation", {"pattern": "^a*$"},
          ("a matching pattern is valid", "aaa", True),
          ("a non-matching pattern is invalid", "abc", False),
          ("ignores non-strings", True, True)),
        g("pattern is not anchored", {"pattern": "a+"},
          ("matches a substring", "xxaayy", True)),
    ],
    "required.json": [
        g("required validation", {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
          ("present required property is valid", {"foo": 1}, True),
          ("non-present required property is invalid", {"bar": 1}, False),
          ("ignores non-objects", 12, True),
          ("null property counts as missing (reference quirk)", {"foo": None}, False)),
    ],
    "properties.json": [
        g("object properties validation",
          {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
          ("both properties present and valid is valid", {"foo": 1, "bar": "baz"}, True),
          ("one property invalid is invalid", {"foo": 1, "bar": {}}, False),
          ("both properties invalid is invalid", {"foo": [], "bar": {}}, False),
          ("doesn't invalidate other properties", {"quux": []}, True),
          ("ignores non-objects", [], True)),
        g("properties, patternProperties, additionalProperties interaction",
          {"properties": {"foo": {"type": "array", "maxItems": 3}, "bar": {"type": "array"}},
           "patternProperties": {"f.o": {"minItems": 2}},
           "additionalProperties": {"type": "integer"}},
          ("property validates property", {"foo": [1, 2]}, True),
          ("property invalidates property", {"foo": [1, 2, 3, 4]}, False),
          ("patternProperty invalidates property", {"foo": []}, False),
          ("patternProperty validates nonproperty", {"fxo": [1, 2]}, True),
          ("patternProperty invalidates nonproperty", {"fxo": []}, False),
          ("additionalProperty ignores property", {"bar": []}, True),
          ("additionalProperty validates others", {"quux": 3}, True),
          ("additionalProperty invalidates others", {"quux": "foo"}, False)),
    ],
    "patternProperties.json": [
        g("patternProperties validates properties matching a regex",
          {"patternProperties": {"f.*o": {"type": "integer"}}},
          ("a single valid match is valid", {"foo": 1}, True),
          ("multiple valid matches is valid", {"foo": 1, "foooooo": 2}, True),
          ("a single invalid match is invalid", {"foo": "bar", "fother": 2}, False),
          ("ignores non-objects", 12, True)),
        g("multiple simultaneous patternProperties are validated",
          {"patternProperties": {"a*": {"type": "integer"}, "aaa*": {"maximum": 20}}},
          ("a single valid match is valid", {"a": 21}, True),
          ("a simultaneous match is valid", {"aaaa": 18}, True),
          ("an invalid due to one is invalid", {"a": "bar"}, False),
          ("an invalid due to the other is invalid", {"aaaa": 31}, False)),
    ],
    "additionalProperties.json": [
        g("additionalProperties being false does not allow other properties",
          {"properties": {"foo": {}, "bar": {}},
           "patternProperties": {"^v": {}},
           "additionalProperties": False},
          ("no additional properties is valid", {"foo": 1}, True),
          ("an additional property is invalid", {"foo": 1, "bar": 2, "quux": "boom"}, False),
          ("ignores non-objects", [1, 2, 3], True),
          ("patternProperties are not additional properties", {"foo": 1, "vroom": 2}, True)),
        g("additionalProperties allows a schema which should validate",
          {"properties": {"foo": {}, "bar": {}},
           "additionalProperties": {"type": "boolean"}},
          ("no additional properties is valid", {"foo": 1}, True),
          ("an additional valid property is valid", {"foo": 1, "bar": 2, "quux": True}, True),
          ("an additional invalid property is invalid", {"foo": 1, "bar": 2, "quux": 12}, False)),
        g("additionalProperties can exist by itself",
          {"additionalProperties": {"type": "boolean"}},
          ("an additional valid property is valid", {"foo": True}, True),
          ("an additional invalid property is invalid", {"foo": 1}, False)),
    ],
    "items.json": [
        g("a schema given for items", {"items": {"type": "integer"}},
          ("valid items", [1, 2, 3], True),
          ("wrong type of items", [1, "x"], False),
          ("ignores non-arrays", {"foo": "bar"}, True)),
        g("an array of schemas for items (tuple form)",
          {"items": [{"type": "integer"}, {"type": "string"}]},
          ("correct types", [1, "foo"], True),
          ("wrong types", ["foo", 1], False),
          ("incomplete array of items", [1], True),
          ("array with additional items", [1, "foo", True], True)),
    ],
    "additionalItems.json": [
        g("additionalItems as schema",
          {"items": [{}], "additionalItems": {"type": "integer"}},
          ("additional items match schema", [None, 2, 3, 4], True),
          ("additional items do not match schema", [None, 2, 3, "foo"], False)),
        g("array of items with no additionalItems",
          {"items": [{}, {}, {}], "additionalItems": False},
          ("fewer number of items present", [1, 2], True),
          ("equal number of items present", [1, 2, 3], True),
          ("additional items are not permitted", [1, 2, 3, 4], False)),
        g("additionalItems are allowed by default", {"items": [{"type": "integer"}]},
          ("only the first item is validated", [1, "foo", False], True)),
    ],
    "maxItems.json": [
        g("maxItems validation", {"maxItems": 2},
          ("shorter is valid", [1], True),
          ("exact length is valid", [1, 2], True),
          ("too long is invalid", [1, 2, 3], False),
          ("ignores non-arrays", "foobar", True)),
    ],
    "minItems.json": [
        g("minItems validation", {"minItems": 1},
          ("longer is valid", [1, 2], True),
          ("exact length is valid", [1], True),
          ("too short is invalid", [], False),
          ("ignores non-arrays", "", True)),
    ],
    "uniqueItems.json": [
        g("uniqueItems validation", {"uniqueItems": True},
          ("unique array of integers is valid", [1, 2], True),
          ("non-unique array of integers is invalid", [1, 1], False),
          ("numbers are unique if mathematically unequal types differ", [1.0, 1], True),
          ("unique array of objects is valid", [{"foo": "bar"}, {"foo": "baz"}], True),
          ("non-unique array of objects is invalid", [{"foo": "bar"}, {"foo": "bar"}], False),
          ("unique array of nested objects is valid",
           [{"foo": {"bar": {"baz": True}}}, {"foo": {"bar": {"baz": False}}}], True),
          ("non-unique array of arrays is invalid", [["foo"], ["foo"]], False),
          ("true is not equal to one", [1, True], True),
          ("false is not equal to zero", [0, False], True),
          ("unique heterogeneous types are valid", [{}, [1], True, None, 1], True)),
    ],
    "maxProperties.json": [
        g("maxProperties validation", {"maxProperties": 2},
          ("shorter is valid", {"foo": 1}, True),
          ("exact length is valid", {"foo": 1, "bar": 2}, True),
          ("too long is invalid", {"foo": 1, "bar": 2, "baz": 3}, False),
          ("ignores non-objects", "foobar", True)),
    ],
    "minProperties.json": [
        g("minProperties validation", {"minProperties": 1},
          ("longer is valid", {"foo": 1, "bar": 2}, True),
          ("exact length is valid", {"foo": 1}, True),
          ("too short is invalid", {}, False),
          ("ignores non-objects", "", True)),
    ],
    "dependencies.json": [
        g("dependencies", {"dependencies": {"bar": ["foo"]}},
          ("neither", {}, True),
          ("nondependant", {"foo": 1}, True),
          ("with dependency", {"foo": 1, "bar": 2}, True),
          ("missing dependency", {"bar": 2}, False),
          ("ignores non-objects", "foo", True)),
        g("multiple dependencies", {"dependencies": {"quux": ["foo", "bar"]}},
          ("neither", {}, True),
          ("with dependencies", {"foo": 1, "bar": 2, "quux": 3}, True),
          ("missing dependency", {"foo": 1, "quux": 2}, False),
          ("missing both dependencies", {"quux": 1}, False)),
        g("dependencies with schema",
          {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"},
                                                   "bar": {"type": "integer"}}}}},
          ("valid", {"foo": 1, "bar": 2}, True),
          ("no dependency", {"foo": "quux"}, True),
          ("wrong type", {"foo": "quux", "bar": 2}, False)),
    ],
    "allOf.json": [
        g("allOf",
          {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                     {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
          ("allOf", {"foo": "baz", "bar": 2}, True),
          ("mismatch second", {"foo": "baz"}, False),
          ("mismatch first", {"bar": 2}, False),
          ("wrong type", {"foo": "baz", "bar": "quux"}, False)),
    ],
    "anyOf.json": [
        g("anyOf", {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
          ("first anyOf valid", 1, True),
          ("second anyOf valid", 2.5, True),
          ("both anyOf valid", 3, True),
          ("neither anyOf valid", 1.5, False)),
    ],
    "oneOf.json": [
        g("oneOf", {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
          ("first oneOf valid", 1, True),
          ("second oneOf valid", 2.5, True),
          ("both oneOf valid", 3, False),
          ("neither oneOf valid", 1.5, False)),
    ],
    "not.json": [
        g("not", {"not": {"type": "integer"}},
          ("allowed", "foo", True),
          ("disallowed", 1, False)),
        g("not multiple types", {"not": {"type": ["integer", "boolean"]}},
          ("valid", "foo", True),
          ("mismatch", 1, False),
          ("other mismatch", True, False)),
    ],
    "ref.json": [
        g("nested refs",
          {"definitions": {"a": {"type": "integer"},
                           "b": {"$ref": "#/definitions/a"},
                           "c": {"$ref": "#/definitions/b"}},
           "$ref": "#/definitions/c"},
          ("nested ref valid", 5, True),
          ("nested ref invalid", "a", False)),
        g("relative pointer ref to object",
          {"properties": {"foo": {"type": "integer"},
                          "bar": {"$ref": "#/properties/foo"}}},
          ("match", {"bar": 3}, True),
          ("mismatch", {"bar": True}, False)),
        g("escaped pointer ref",
          {"definitions": {"tilda~field": {"type": "integer"},
                           "slash/field": {"type": "integer"},
                           "percent%field": {"type": "integer"}},
           "properties": {"tilda": {"$ref": "#/definitions/tilda~0field"},
                          "slash": {"$ref": "#/definitions/slash~1field"},
                          "percent": {"$ref": "#/definitions/percent%25field"}}},
          ("slash valid", {"slash": 123}, True),
          ("tilda valid", {"tilda": 123}, True),
          ("percent valid", {"percent": 123}, True),
          ("slash invalid", {"slash": "aoeu"}, False),
          ("tilda invalid", {"tilda": "aoeu"}, False),
          ("percent invalid", {"percent": "aoeu"}, False)),
        g("recursive references between schemas",
          {"id": "http://localhost:1234/tree",
           "description": "tree of nodes",
           "type": "object",
           "properties": {"meta": {"type": "string"},
                          "nodes": {"type": "array", "items": {"$ref": "#/definitions/node"}}},
           "required": ["meta", "nodes"],
           "definitions": {"node": {"type": "object",
                                    "properties": {"value": {"type": "number"},
                                                   "subtree": {"$ref": "#"}},
                                    "required": ["value"]}}},
          ("valid tree", {"meta": "root", "nodes": [
              {"value": 1, "subtree": {"meta": "child", "nodes": [{"value": 1.1}]}},
              {"value": 2}]}, True),
          ("invalid tree", {"meta": "root", "nodes": [
              {"value": 1, "subtree": {"meta": "child", "nodes": [{"value": "string is invalid"}]}}]},
           False)),
    ],
    "format.json": [
        g("validation of date-time strings", {"format": "date-time"},
          ("a valid date-time string", "1963-06-19T08:30:06.283185Z", True),
          ("an invalid date-time string", "06/19/1963 08:30:06 PST", False),
          ("only RFC3339 not all of ISO 8601 are valid", "2013-350T01:01:01", False),
          ("ignores non-strings", 12, True)),
        g("validation of emails", {"format": "email"},
          ("a valid email", "joe.bloggs@example.com", True),
          ("an invalid email", "2962", False)),
        g("validation of ipv4 addresses", {"format": "ipv4"},
          ("a valid IP address", "192.168.0.1", True),
          ("too many components", "127.0.0.0.1", False),
          ("out-of-range values", "256.256.256.256", False)),
        g("validation of hostnames", {"format": "hostname"},
          ("a valid hostname", "www.example.com", True),
          ("a hostname with underscore is invalid", "not_a_valid_host_name", False)),
        g("validation of URIs", {"format": "uri"},
          ("a valid URI", "http://foo.bar/?baz=qux#quux", True),
          ("a protocol-relative URI reference is invalid", "//foo.bar/?baz=qux#quux", False),
          ("a URI with spaces is invalid", "http:// shouldfail.com", False)),
    ],
    "default.json": [
        g("invalid type for default",
          {"properties": {"foo": {"type": "integer", "default": []}}},
          ("valid when property is specified", {"foo": 13}, True),
          ("still valid when the invalid default is used", {}, True)),
    ],
    "definitions.json": [
        g("definitions with $ref",
          {"definitions": {"positiveInteger": {"type": "integer", "minimum": 0}},
           "properties": {"n": {"$ref": "#/definitions/positiveInteger"}}},
          ("valid definition reference", {"n": 5}, True),
          ("invalid definition reference", {"n": -5}, False)),
    ],
}

DRAFT6 = {
    "const.json": [
        g("const validation", {"const": 2},
          ("same value is valid", 2, True),
          ("another value is invalid", 5, False),
          ("another type is invalid", "a", False)),
        g("const with object", {"const": {"foo": "bar", "baz": "bax"}},
          ("same object is valid", {"foo": "bar", "baz": "bax"}, True),
          ("same object with different property order is valid", {"baz": "bax", "foo": "bar"}, True),
          ("another object is invalid", {"foo": "bar"}, False)),
        g("const with null", {"const": None},
          ("null is valid", None, True),
          ("not null is invalid", 0, False)),
    ],
    "contains.json": [
        g("contains keyword validation", {"contains": {"minimum": 5}},
          ("array with item matching schema (5) is valid", [3, 4, 5], True),
          ("array with two items matching schema is valid", [3, 4, 5, 6], True),
          ("array without items matching schema is invalid", [2, 3, 4], False),
          ("empty array is invalid", [], False),
          ("not array is valid", {}, True)),
    ],
    "propertyNames.json": [
        g("propertyNames validation", {"propertyNames": {"maxLength": 3}},
          ("all property names valid", {"f": {}, "foo": {}}, True),
          ("some property names invalid", {"foo": {}, "foobar": {}}, False),
          ("object without properties is valid", {}, True),
          ("ignores non-objects", [1, 2, 3, 4], True)),
    ],
    "exclusiveMinimum.json": [
        g("exclusiveMinimum validation (draft-6 numeric form)", {"exclusiveMinimum": 1.1},
          ("above the exclusiveMinimum is valid", 1.2, True),
          ("boundary point is invalid", 1.1, False),
          ("below the exclusiveMinimum is invalid", 0.6, False),
          ("ignores non-numbers", "x", True)),
    ],
    "exclusiveMaximum.json": [
        g("exclusiveMaximum validation (draft-6 numeric form)", {"exclusiveMaximum": 3.0},
          ("below the exclusiveMaximum is valid", 2.2, True),
          ("boundary point is invalid", 3.0, False),
          ("above the exclusiveMaximum is invalid", 3.5, False),
          ("ignores non-numbers", "x", True)),
    ],
    "boolean_schema.json": [
        g("boolean schema 'true'", True,
          ("number is valid", 1, True),
          ("string is valid", "foo", True),
          ("null is valid", None, True)),
        g("boolean schema 'false'", False,
          ("number is invalid", 1, False),
          ("null is invalid", None, False)),
        g("properties with boolean schema",
          {"properties": {"foo": True, "bar": False}},
          ("no property present is valid", {}, True),
          ("only 'true' property present is valid", {"foo": 1}, True),
          ("'false' property present is invalid", {"foo": 1, "bar": 2}, False)),
    ],
}

DRAFT7 = {
    "if-then-else.json": [
        g("if with then and else",
          {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
          ("valid through then", -1, True),
          ("invalid through then", -100, False),
          ("valid through else", 4, True),
          ("invalid through else", 3, False)),
        g("ignore if without then or else",
          {"if": {"const": 0}},
          ("valid when valid against lone if", 0, True),
          ("valid when invalid against lone if", "hello", True)),
        g("if and then without else",
          {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
          ("valid through then", -1, True),
          ("invalid through then", -100, False),
          ("valid when if test fails", 3, True)),
    ],
}

DRAFT3 = {
    "extends.json": [
        g("extends",
          {"properties": {"bar": {"type": "integer", "required": True}},
           "extends": {"properties": {"foo": {"type": "string", "required": True}}}},
          ("extends", {"foo": "baz", "bar": 2}, True),
          ("mismatch extends", {"bar": 2}, False),
          ("mismatch extended", {"foo": "baz"}, False),
          ("wrong type", {"foo": "baz", "bar": "quux"}, False)),
        # the official "multiple extends" group is in the reference's skip
        # list, but its focus test (v3_test.clj focus-3-test-a) pins the
        # array form as a merge of every extended schema — both sides of
        # that skip boundary, pinned to the focus test's semantics:
        g("multiple extends merge every schema (v3_test.clj focus-3-test-a)",
          {"properties": {"bar": {"type": "integer", "required": True}},
           "extends": [{"properties": {"foo": {"type": "string", "required": True}}},
                       {"properties": {"baz": {"type": "string", "required": True}}}]},
          ("all merged requirements met", {"foo": "quux", "bar": 2, "baz": "foo"}, True),
          ("first extended schema unmet", {"bar": 2, "baz": "foo"}, False),
          ("second extended schema unmet", {"foo": "quux", "bar": 2}, False),
          ("base schema unmet", {"foo": "quux", "baz": "foo"}, False)),
    ],
    "ref_siblings.json": [
        # the official "ref overrides any sibling keywords" group is skipped
        # by the reference (v3_test.clj/v4_test.clj) because its compiler
        # treats $ref as one keyword among the others (core.clj schema-key
        # dispatch) — siblings VALIDATE alongside the resolved ref.  Pin
        # that actual behavior:
        g("$ref siblings validate alongside the ref (reference semantics)",
          {"$ref": "#/definitions/reffed", "maxItems": 2,
           "definitions": {"reffed": {"type": "array"}}},
          ("ref valid, sibling maxItems satisfied", ["a", "b"], True),
          ("ref valid, sibling maxItems violated", ["a", "b", "c"], False),
          ("ref itself violated", "not-an-array", False)),
    ],
    "format_regex_dialect.json": [
        # the official "ECMA 262 regex dialect recognition" group is skipped
        # by the reference: it compiles format:regex with java.util.regex,
        # whose dialect accepts lookbehind (focus-3-test-a pins the
        # unclosed-group case as invalid).  Pin the JVM-dialect boundary:
        g("format regex uses the JVM dialect, not ECMA 262",
          {"format": "regex"},
          ("plain regex is valid", "a+b*c?", True),
          ("lookbehind is valid in the JVM dialect", "(?<=foo)bar", True),
          ("unclosed group is invalid (v3_test.clj focus-3-test-a)", "(?<=foobar", False),
          ("unbalanced bracket is invalid", "[a-z", False)),
    ],
    "disallow.json": [
        g("disallow", {"disallow": "integer"},
          ("allowed", "foo", True),
          ("disallowed", 1, False)),
        g("multiple disallow", {"disallow": ["integer", "boolean"]},
          ("valid", "foo", True),
          ("mismatch", 1, False),
          ("other mismatch", True, False)),
        g("multiple disallow subschema",
          {"disallow": ["string", {"type": "object",
                                   "properties": {"foo": {"type": "string"}}}]},
          ("valid", 1, True),
          ("other mismatch", {"foo": "bar"}, False)),
    ],
    "divisibleBy.json": [
        g("by int", {"divisibleBy": 2},
          ("int by int", 10, True),
          ("int by int fail", 7, False),
          ("ignores non-numbers", "foo", True)),
        g("by number (official draft-3 case, v3_test.clj focus-3-test-a)",
          {"divisibleBy": 1.5},
          ("zero is divisible by anything", 0, True),
          ("4.5 is divisible by 1.5", 4.5, True),
          ("35 is not divisible by 1.5", 35, False)),
        g("by small number (official draft-3 case)",
          {"divisibleBy": 0.0001},
          ("0.0075 is divisible by 0.0001", 0.0075, True),
          ("0.00751 is not divisible by 0.0001", 0.00751, False)),
    ],
    "required_boolean.json": [
        g("required draft-3 boolean form",
          {"properties": {"foo": {"type": "string", "required": True},
                          "bar": {"type": "integer"}}},
          ("present required property is valid", {"foo": "x"}, True),
          ("non-present required property is invalid", {"bar": 1}, False)),
    ],
    "type_union.json": [
        g("union type with schema member (draft-3)",
          {"type": ["integer", {"type": "object", "properties": {"foo": {"type": "string"}}}]},
          ("integer is valid", 1, True),
          ("matching object is valid", {"foo": "x"}, True),
          ("non-matching object is invalid", {"foo": 1}, False),
          ("plain string is invalid", "x", False)),
    ],
}


# v5-proposal keywords + $data, mirroring the reference's own v5 suite
# (/root/reference/test/v5/*.json and test/v5/$data/*.json, driver
# v5_test.clj:10-19 — no skip-list).  Cases authored fresh, pinned to the
# reference implementation's semantics (core.clj lines cited per file).
V5 = {
    # core.clj:500-517 — json-compare equality, deep for objects
    "constant.json": [
        g("constant requires equality with a scalar", {"constant": 7},
          ("equal number is valid", 7, True),
          ("different number is invalid", 8, False),
          ("different type is invalid", "7", False)),
        g("constant requires equality with an object", {"constant": {"a": 1, "b": [2, 3]}},
          ("deep-equal object is valid", {"a": 1, "b": [2, 3]}, True),
          ("key order does not matter", {"b": [2, 3], "a": 1}, True),
          ("nested difference is invalid", {"a": 1, "b": [2, 4]}, False),
          ("missing key is invalid", {"a": 1}, False)),
    ],
    # core.clj:1380-1391 — contains composed with constant
    "contains_constant.json": [
        g("contains with constant subschema", {"contains": {"constant": 9}},
          ("array holding the constant is valid", [1, 9], True),
          ("array without the constant is invalid", [1, 2], False),
          ("non-array passes", "not-an-array", True)),
    ],
    # core.clj:671-722 — ordered clauses, then:bool/schema, continue, default
    "switch.json": [
        g("switch applies then when if matches", {"switch": [
              {"if": {"minimum": 100}, "then": {"multipleOf": 10}}]},
          ("matches if and then is valid", 120, True),
          ("matches if but fails then is invalid", 123, False),
          ("if not matched falls through to pass", 5, True)),
        g("switch then false rejects", {"switch": [
              {"if": {"type": "string"}, "then": False}]},
          ("matching if with then false is invalid", "s", False),
          ("non-matching value is valid", 1, True)),
        g("switch then true accepts", {"switch": [
              {"if": {"minimum": 0}, "then": True},
              {"then": False}]},
          ("first clause wins", 3, True),
          ("default clause rejects the rest", -3, False)),
        g("switch default schema clause", {"switch": [
              {"if": {"type": "string"}, "then": {"minLength": 2}},
              {"then": {"minimum": 50}}]},
          ("string goes through first clause", "ab", True),
          ("short string fails first clause", "a", False),
          ("number goes through default clause", 60, True),
          ("small number fails default clause", 10, False)),
        g("switch continue falls through", {"switch": [
              {"if": {"minimum": 0}, "then": {"multipleOf": 2}, "continue": True},
              {"if": {"minimum": 10}, "then": {"multipleOf": 3}}]},
          ("both clauses apply", 12, True),
          ("fails second clause after continue", 14, False),
          ("fails first clause", 7, False),
          ("below second if only first applies", 4, True)),
    ],
    # core.clj:1114-1151 + compile-format-coerce 1093-1109
    "formatMaximum.json": [
        g("formatMaximum with date format",
          {"format": "date", "formatMaximum": "2020-06-15"},
          ("earlier date is valid", "2020-06-01", True),
          ("boundary date is valid", "2020-06-15", True),
          ("later date is invalid", "2020-07-01", False),
          ("non-string passes", 4, True)),
        g("exclusiveFormatMaximum makes the bound open",
          {"format": "date", "formatMaximum": "2020-06-15",
           "exclusiveFormatMaximum": True},
          ("earlier date is valid", "2020-06-14", True),
          ("boundary date is invalid", "2020-06-15", False)),
        g("formatMaximum with time format strips timezone",
          {"format": "time", "formatMaximum": "10:30:00.000Z"},
          ("earlier time is valid", "09:00:00.000Z", True),
          ("equal time with offset suffix is valid", "10:30:00.000+05:00", True),
          ("later time is invalid", "11:00:00.000Z", False)),
        g("formatMaximum with unknown format is ignored",
          {"format": "unknown", "formatMaximum": "zzz"},
          ("anything is valid", "zzzzzzz", True)),
    ],
    "formatMinimum.json": [
        g("formatMinimum with date format",
          {"format": "date", "formatMinimum": "2020-06-15"},
          ("later date is valid", "2020-07-01", True),
          ("boundary date is valid", "2020-06-15", True),
          ("earlier date is invalid", "2020-06-01", False),
          ("non-string passes", True, True)),
        g("exclusiveFormatMinimum makes the bound open",
          {"format": "date", "formatMinimum": "2020-06-15",
           "exclusiveFormatMinimum": True},
          ("later date is valid", "2020-06-16", True),
          ("boundary date is invalid", "2020-06-15", False)),
    ],
    # core.clj:889-909 — per-regex some-key-matches, re-find semantics
    "patternRequired.json": [
        g("patternRequired needs a key matching the pattern",
          {"patternRequired": ["^x-"]},
          ("matching key present is valid", {"x-trace": 1}, True),
          ("no matching key is invalid", {"trace": 1}, False),
          ("non-object passes", [1, 2], True)),
        g("every pattern must be matched by some key",
          {"patternRequired": ["id$", "^v"]},
          ("both patterns matched is valid", {"user_id": 1, "version": 2}, True),
          ("one key can satisfy only one pattern", {"vid": 1}, True),
          ("missing one pattern is invalid", {"user_id": 1}, False),
          ("empty object is invalid", {}, False)),
        g("patternRequired uses find not full match",
          {"patternRequired": ["b+"]},
          ("substring match satisfies", {"abba": 1}, True),
          ("case sensitive", {"ABBA": 1}, False)),
    ],
    # core.clj:613-646 — per-group schema + matched-count bounds
    "patternGroups.json": [
        g("patternGroups validates values of matching keys",
          {"patternGroups": {"^n_": {"schema": {"type": "integer"}}}},
          ("matching key with valid value", {"n_rows": 3}, True),
          ("matching key with invalid value", {"n_rows": "3"}, False),
          ("non-matching keys are ignored", {"name": "x"}, True),
          ("non-object passes", 0, True)),
        g("patternGroups minimum match count",
          {"patternGroups": {"^n_": {"schema": {"type": "integer"}, "minimum": 2}}},
          ("two matching keys is valid", {"n_a": 1, "n_b": 2}, True),
          ("one matching key is invalid", {"n_a": 1}, False)),
        g("patternGroups maximum match count",
          {"patternGroups": {"^n_": {"schema": True, "maximum": 1}}},
          ("one matching key is valid", {"n_a": 1, "other": 2}, True),
          ("two matching keys is invalid", {"n_a": 1, "n_b": 2}, False)),
        g("additionalProperties honours patternGroups keys",
          {"properties": {"plain": {}},
           "patternGroups": {"^n_": {"schema": {"type": "integer"}}},
           "additionalProperties": False},
          ("declared and group-matched keys are allowed", {"plain": 1, "n_a": 2}, True),
          ("an unmatched extra key is invalid", {"plain": 1, "stray": 2}, False)),
    ],
    # compile-comparator core.clj:93-124 + compile-pointer 65-91
    "data_numeric.json": [
        g("maximum bound read from a sibling property",
          {"properties": {"cap": {}, "v": {"maximum": {"$data": "1/cap"}}}},
          ("below the referenced cap is valid", {"cap": 10, "v": 9}, True),
          ("equal to the referenced cap is valid", {"cap": 10, "v": 10}, True),
          ("above the referenced cap is invalid", {"cap": 10, "v": 11}, False),
          ("missing pointer target passes", {"v": 99}, True),
          ("non-numeric bound is invalid", {"cap": "ten", "v": 1}, False),
          ("non-numeric value passes", {"cap": 10, "v": "s"}, True)),
        g("minimum bound read from the root",
          {"properties": {"floor": {}, "deep": {"properties": {
               "v": {"minimum": {"$data": "#/floor"}}}}}},
          ("above the root floor is valid", {"floor": 5, "deep": {"v": 6}}, True),
          ("below the root floor is invalid", {"floor": 5, "deep": {"v": 4}}, False)),
        g("multipleOf divisor from a sibling with escaped pointer",
          {"properties": {"a/b~": {}, "v": {"multipleOf": {"$data": "1/a~1b~0"}}}},
          ("multiple of the referenced divisor is valid", {"a/b~": 4, "v": 12}, True),
          ("non-multiple is invalid", {"a/b~": 4, "v": 13}, False)),
        g("item must be a multiple of its own index",
          {"items": [{}], "additionalItems": {"multipleOf": {"$data": "0#"}}},
          ("multiples of their index are valid", [None, 1, 4, 9], True),
          ("a non-multiple of its index is invalid", [None, 1, 5], False)),
    ],
    "data_strings.json": [
        g("maxLength read from a sibling property",
          {"properties": {"lim": {}, "s": {"maxLength": {"$data": "1/lim"}}}},
          ("within the referenced limit is valid", {"lim": 3, "s": "abc"}, True),
          ("over the referenced limit is invalid", {"lim": 3, "s": "abcd"}, False),
          ("missing limit passes", {"s": "abcdef"}, True)),
        g("pattern read from a sibling property",
          {"properties": {"re": {}, "s": {"pattern": {"$data": "1/re"}}}},
          ("matching the referenced pattern is valid", {"re": "^a", "s": "abc"}, True),
          ("not matching is invalid", {"re": "^a", "s": "bcd"}, False),
          ("missing pattern passes", {"s": "zzz"}, True),
          ("non-string pattern is invalid", {"re": 5, "s": "abc"}, False)),
        g("format name read from a sibling property",
          {"properties": {"f": {}, "s": {"format": {"$data": "1/f"}}}},
          ("value matching the referenced format is valid",
           {"f": "ipv4", "s": "10.0.0.1"}, True),
          ("value not matching is invalid", {"f": "ipv4", "s": "999.0.0.1"}, False),
          ("missing format passes", {"s": "anything"}, True),
          ("unresolvable format name is invalid", {"f": "no-such", "s": "x"}, False)),
        g("property value must conform to the format named by its key",
          {"additionalProperties": {"format": {"$data": "0#"}}},
          ("values matching their key-formats are valid",
           {"date": "2020-01-02", "ipv4": "127.0.0.1"}, True),
          ("a value violating its key-format is invalid", {"date": "not-a-date"}, False)),
    ],
    "data_structures.json": [
        g("enum list read from a sibling property",
          {"properties": {"allowed": {}, "v": {"enum": {"$data": "1/allowed"}}}},
          ("member of the referenced list is valid", {"allowed": [1, 2], "v": 2}, True),
          ("non-member is invalid", {"allowed": [1, 2], "v": 3}, False),
          ("missing list passes", {"v": 3}, True),
          ("non-array enum source is invalid", {"allowed": 5, "v": 5}, False),
          ("missing target property is not validated", {"allowed": [1, 2]}, True)),
        g("constant read from a sibling property",
          {"properties": {"expect": {}, "v": {"constant": {"$data": "1/expect"}}}},
          ("equal to the referenced value is valid", {"expect": "x", "v": "x"}, True),
          ("different is invalid", {"expect": "x", "v": "y"}, False)),
        g("maxItems read from a sibling property",
          {"properties": {"lim": {}, "xs": {"maxItems": {"$data": "1/lim"}}}},
          ("within the referenced limit is valid", {"lim": 2, "xs": [1, 2]}, True),
          ("over the referenced limit is invalid", {"lim": 2, "xs": [1, 2, 3]}, False)),
        g("minProperties read from a sibling property",
          {"properties": {"lim": {}, "o": {"minProperties": {"$data": "1/lim"}}}},
          ("enough keys is valid", {"lim": 1, "o": {"a": 1}}, True),
          ("too few keys is invalid", {"lim": 2, "o": {"a": 1}}, False)),
        g("required list read from the instance",
          {"properties": {"must": {}}, "required": {"$data": "0/must"}},
          ("all listed keys present is valid", {"must": ["a"], "a": 1}, True),
          ("a listed key missing is invalid", {"must": ["a", "b"], "a": 1}, False),
          ("missing list passes", {"a": 1}, True),
          ("non-array required source is invalid", {"must": "a", "a": 1}, False)),
        g("uniqueItems flag read from a sibling property",
          {"properties": {"u": {}, "xs": {"uniqueItems": {"$data": "1/u"}}}},
          ("duplicates allowed when flag is false", {"u": False, "xs": [1, 1]}, True),
          ("duplicates rejected when flag is true", {"u": True, "xs": [1, 1]}, False),
          ("unique list passes under true flag", {"u": True, "xs": [1, 2]}, True),
          ("missing flag passes", {"xs": [1, 1]}, True),
          ("non-boolean flag is invalid", {"u": "yes", "xs": [1, 2]}, False)),
    ],
    "data_format_bounds.json": [
        g("formatMaximum bound read from a sibling property",
          {"properties": {"cap": {},
                          "d": {"format": "date",
                                "formatMaximum": {"$data": "1/cap"}}}},
          ("date below the referenced cap is valid",
           {"cap": "2021-01-01", "d": "2020-12-31"}, True),
          ("date above the referenced cap is invalid",
           {"cap": "2021-01-01", "d": "2021-01-02"}, False),
          ("missing bound passes", {"d": "2030-01-01"}, True),
          ("non-string bound is invalid", {"cap": 7, "d": "2020-01-01"}, False)),
        g("exclusive flag read from the instance",
          {"properties": {"ex": {},
                          "d": {"format": "date",
                                "formatMinimum": "2021-01-01",
                                "exclusiveFormatMinimum": {"$data": "1/ex"}}}},
          ("boundary is valid when flag is false", {"ex": False, "d": "2021-01-01"}, True),
          ("boundary is invalid when flag is true", {"ex": True, "d": "2021-01-01"}, False)),
    ],
}


def write(draft: str, files: dict):
    d = os.path.join(OUT, draft)
    os.makedirs(d, exist_ok=True)
    for fname, groups in files.items():
        with open(os.path.join(d, fname), "w") as f:
            json.dump(groups, f, indent=1)
    print(draft, sum(len(gs) for gs in files.values()), "groups",
          sum(len(t["tests"]) for gs in files.values() for t in gs), "tests")




# ---------------------------------------------------------------------------
# draft-6 / draft-7 widening.  The reference runs drafts through ONE compile
# path with no draft dispatch (core.clj compile; v6_test.clj / v7_test.clj
# differ only in which official files they load and skip), so the core
# keyword semantics pinned by the draft-4 corpus hold verbatim in 6/7 — the
# official suite likewise repeats most files across drafts.  Draft-4-only
# forms (boolean exclusiveMinimum/Maximum riders) are filtered out; the
# groups the reference's own skip-lists exclude (ECMA-262 regex dialect,
# numeric unification, ref-overrides-siblings, allOf with base schema,
# draft-3-style items schema arrays, and for draft-7 the content/media-type
# trio + RJP + idn-hostname formats) are not generated, matching
# v6_test.clj:81-92 and v7_test.clj:67-87.

_SHARED_6_7_FILES = [
    "type.json", "enum.json", "multipleOf.json", "maxLength.json",
    "minLength.json", "pattern.json", "properties.json",
    "patternProperties.json", "additionalProperties.json", "items.json",
    "additionalItems.json", "maxItems.json", "minItems.json",
    "maxProperties.json", "minProperties.json", "uniqueItems.json",
    "allOf.json", "anyOf.json", "oneOf.json", "not.json",
    "definitions.json", "ref.json", "dependencies.json", "format.json",
    "required.json",
]


def _common_6_7():
    out = {f: DRAFT4[f] for f in _SHARED_6_7_FILES}
    # draft-6 dropped the boolean exclusive* riders — keep only plain bounds
    out["minimum.json"] = [
        grp for grp in DRAFT4["minimum.json"] if "exclusiveMinimum" not in grp["schema"]
    ]
    out["maximum.json"] = [
        grp for grp in DRAFT4["maximum.json"] if "exclusiveMaximum" not in grp["schema"]
    ]
    # draft-6-introduced keywords, both sides of the subtle boundaries
    out["const_edge.json"] = [
        g("const with array requires deep equality", {"const": [1, [2, 3]]},
          ("deep-equal array is valid", [1, [2, 3]], True),
          ("nested difference is invalid", [1, [2, 4]], False),
          ("prefix is invalid", [1], False),
          ("another type is invalid", "x", False)),
        g("const with empty object", {"const": {}},
          ("empty object is valid", {}, True),
          ("non-empty object is invalid", {"a": 1}, False),
          ("empty array is invalid", [], False)),
        g("const false does not equal zero", {"const": False},
          ("false is valid", False, True),
          ("zero is invalid", 0, False)),
        g("const true does not equal one", {"const": True},
          ("true is valid", True, True),
          ("one is invalid", 1, False)),
    ]
    out["contains_edge.json"] = [
        g("contains with const subschema", {"contains": {"const": 5}},
          ("array with the constant is valid", [1, 5], True),
          ("array without the constant is invalid", [1, 2], False),
          ("empty array is invalid", [], False)),
        g("contains with boolean schema true", {"contains": True},
          ("non-empty array is valid", ["x"], True),
          ("empty array is invalid", [], False)),
        g("contains with boolean schema false", {"contains": False},
          ("any non-empty array is invalid", ["x"], False),
          ("empty array is invalid", [], False)),
        g("contains with string type honours the blank-string quirk",
          {"contains": {"type": "string"}},
          ("array holding a real string is valid", [1, "x"], True),
          ("a blank string does not count as a string (reference quirk)",
           [1, ""], False),
          ("array of numbers is invalid", [1, 2], False)),
        g("nested contains", {"contains": {"contains": {"minimum": 5}}},
          ("inner array with a big item is valid", [[3, 6]], True),
          ("no inner array qualifies is invalid", [[1, 2], [3]], False)),
    ]
    out["propertyNames_edge.json"] = [
        g("propertyNames with pattern uses find semantics",
          {"propertyNames": {"pattern": "^a"}},
          ("all keys start with a", {"abc": 1, "a": 2}, True),
          ("a key not starting with a is invalid", {"abc": 1, "xa": 2}, False),
          ("empty object is valid", {}, True)),
        g("propertyNames with boolean schema false", {"propertyNames": False},
          ("empty object is valid", {}, True),
          ("any key is invalid", {"k": 1}, False)),
        g("propertyNames with enum", {"propertyNames": {"enum": ["a", "b"]}},
          ("only allowed keys", {"a": 1, "b": 2}, True),
          ("a stray key is invalid", {"a": 1, "c": 3}, False)),
    ]
    out["exclusive_numeric_edge.json"] = [
        g("exclusiveMinimum with integer boundary", {"exclusiveMinimum": 5},
          ("above is valid", 6, True),
          ("boundary is invalid", 5, False),
          ("below is invalid", 4, False),
          ("ignores non-numbers", "5", True)),
        g("exclusiveMaximum with integer boundary", {"exclusiveMaximum": 5},
          ("below is valid", 4, True),
          ("boundary is invalid", 5, False),
          ("fractional below the bound is valid", 4.9, True)),
        g("inclusive and exclusive bounds combined",
          {"minimum": 0, "exclusiveMaximum": 10},
          ("inclusive floor is valid", 0, True),
          ("inside the range is valid", 9, True),
          ("exclusive ceiling is invalid", 10, False),
          ("below the floor is invalid", -1, False)),
    ]
    out["boolean_ref.json"] = [
        g("$ref to boolean schema true",
          {"$ref": "#/definitions/bool", "definitions": {"bool": True}},
          ("any value is valid", "foo", True)),
        g("$ref to boolean schema false",
          {"$ref": "#/definitions/bool", "definitions": {"bool": False}},
          ("any value is invalid", "foo", False)),
        g("property $ref into definitions",
          {"properties": {"prop": {"$ref": "#/definitions/s"}},
           "definitions": {"s": {"type": "string"}}},
          ("conforming property is valid", {"prop": "x"}, True),
          ("non-conforming property is invalid", {"prop": 1}, False)),
    ]
    out["dependencies_boolean.json"] = [
        g("dependencies with boolean subschemas",
          {"dependencies": {"foo": True, "bar": False}},
          ("neither present is valid", {}, True),
          ("true-dependency key present is valid", {"foo": 1}, True),
          ("false-dependency key present is invalid", {"bar": 2}, False),
          ("both present is invalid", {"foo": 1, "bar": 2}, False),
          ("ignores non-objects", "foo", True)),
        g("empty dependency arrays always pass", {"dependencies": {"foo": []}},
          ("key present is valid", {"foo": 1}, True),
          ("key absent is valid", {}, True)),
    ]
    out["format_functional.json"] = [
        # json-pointer evidence: v6_test.clj custom-6-test inline cases
        g("validation of JSON pointers", {"format": "json-pointer"},
          ("a bare token is not a pointer", "a", False),
          ("a trailing lone tilde is invalid", "/~0~", False),
          ("escaped segments and percent are valid", "/foo/bar~0/baz~1/%a", True),
          ("the empty pointer is valid", "", True),
          ("ignores non-strings", 7, True)),
        # uri / uri-reference / uri-template evidence: v6/v7 inline cases
        g("validation of URIs (functional)", {"format": "uri"},
          ("absolute URI with query and fragment is valid",
           "http://foo.bar/?baz=qux#quux", True),
          ("protocol-relative reference is invalid", "//foo.bar/?baz=qux#quux", False),
          ("a URI with a space is invalid", "http:// shouldfail.com", False),
          ("a scheme-less string is invalid", "foo.bar", False)),
        g("validation of URI references", {"format": "uri-reference"},
          ("a relative path reference is valid", "relative/path#frag", True),
          ("a backslash path is invalid", "\\\\WINDOWS\\fileshare", False),
          ("a reference with a space is invalid", "has space", False)),
        g("validation of URI templates", {"format": "uri-template"},
          ("closed template expressions are valid",
           "http://example.com/dictionary/{term:1}/{term}", True),
          ("an unclosed expression is invalid",
           "http://example.com/dictionary/{term:1}/{term", False),
          ("a template-less URI is valid", "http://example.com/plain", True)),
    ]
    return out


DRAFT6.update(_common_6_7())

DRAFT7.update(_common_6_7())
DRAFT7["if-then-else_edge.json"] = [
    g("if with boolean then", {"if": {"minimum": 0}, "then": False},
      ("matching if hits then false", 1, False),
      ("non-matching if passes", -1, True)),
    g("if with boolean else", {"if": {"minimum": 0}, "else": False},
      ("matching if passes", 1, True),
      ("non-matching if hits else false", -1, False)),
    g("if and else without then (v7_test.clj inline)",
      {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
      ("matching if with no then is valid", -1, True),
      ("else branch valid", 4, True),
      ("else branch invalid", 3, False)),
    g("if-then-else nested under properties",
      {"properties": {"v": {"if": {"type": "string"},
                            "then": {"minLength": 2},
                            "else": {"minimum": 10}}}},
      ("string through then is valid", {"v": "ab"}, True),
      ("short string through then is invalid", {"v": "a"}, False),
      ("number through else is valid", {"v": 11}, True),
      ("small number through else is invalid", {"v": 2}, False)),
    g("ignore then without if", {"then": {"const": 0}},
      ("anything is valid", "x", True)),
    g("ignore else without if", {"else": {"const": 0}},
      ("anything is valid", "x", True)),
]
DRAFT7["format_datetime.json"] = [
    g("validation of date-time strings (functional ISO parse)",
      {"format": "date-time"},
      ("a valid RFC3339 date-time is valid", "1963-06-19T08:30:06.283185Z", True),
      ("a locale string is invalid", "06/19/1963 08:30:06 PST", False),
      ("an ordinal date is invalid", "2013-350T01:01:01", False),
      ("ignores non-strings", 12, True)),
    g("validation of dates", {"format": "date"},
      ("a valid date is valid", "2020-02-29", True),
      ("a non-date string is invalid", "not-a-date", False),
      ("ignores non-strings", [], True)),
    g("validation of times", {"format": "time"},
      ("a valid zulu time is valid", "08:30:06.283185Z", True),
      ("a valid offset time is valid", "08:30:06+05:00", True),
      ("a non-time string is invalid", "8 o'clock", False)),
]




# draft-3 widening: same single-compile-path argument as draft-6/7 (the
# reference routes every draft through one compile; v3_test.clj skips only
# "multiple extends", the ECMA regex dialect group, and
# ref-overrides-siblings).  Shared keyword files whose draft-3 semantics
# are identical are reused; draft-4-only forms (array `required`, allOf/
# anyOf/oneOf/not which draft-3 lacks) are NOT copied.  minimum/maximum
# keep their boolean exclusive* riders — that is draft-3's (and 4's) form.
_SHARED_3_FILES = [
    "enum.json", "pattern.json", "minLength.json", "maxLength.json",
    "minItems.json", "maxItems.json", "uniqueItems.json", "items.json",
    "additionalItems.json", "additionalProperties.json",
    "patternProperties.json", "dependencies.json", "minimum.json",
    "maximum.json", "format.json",
]
DRAFT3.update({f: DRAFT4[f] for f in _SHARED_3_FILES})
DRAFT3["format_draft3.json"] = [
    # color evidence: v3_test.clj focus-3-test-a inline cases
    g("validation of CSS colors", {"format": "color"},
      ("a six-digit hex color is valid", "#CC8899", True),
      ("an eight-digit hex color is valid (alpha form)", "#00332520", False),
      ("a named color is valid", "teal", True),
      ("a non-color word is invalid", "not-a-color", False)),
    g("validation of ip-addresses (draft-3 name)", {"format": "ip-address"},
      ("a valid IP address is valid", "192.168.0.1", True),
      ("out-of-range octets are invalid", "256.256.256.256", False)),
    g("validation of host names (draft-3 name)", {"format": "host-name"},
      ("a valid host name is valid", "www.example.com", True),
      ("an underscore is invalid", "not_valid", False)),
]
DRAFT3["optional_boolean.json"] = [
    g("non-required properties may be absent",
      {"properties": {"foo": {"type": "string"},
                      "bar": {"type": "integer", "required": True}}},
      ("absent optional property is valid", {"bar": 1}, True),
      ("present optional property is type-checked", {"foo": 1, "bar": 1}, False),
      ("absent required property is invalid", {"foo": "x"}, False)),
]


if __name__ == "__main__":
    write("draft3", DRAFT3)
    write("draft4", DRAFT4)
    write("draft6", DRAFT6)
    write("draft7", DRAFT7)
    write("v5", V5)
