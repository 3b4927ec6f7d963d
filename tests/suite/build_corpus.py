"""Hand-written draft-4 conformance corpus generator (FIXTURES.md §3).

The public JSON-Schema-Test-Suite is not obtainable offline, so this
writes an equivalent corpus from the draft-4 spec text
(json-schema-validation draft-fge-00) in the suite's exact file format:
one file per keyword, each an array of {description, schema, tests} groups.
Re-run to regenerate: ``python tests/suite/build_corpus.py``.
"""

import json
import os

HERE = os.path.join(os.path.dirname(__file__), "draft4")

C = {}  # filename -> groups

C["type"] = [
    {"description": "integer type matches integers", "schema": {"type": "integer"}, "tests": [
        {"description": "an integer is an integer", "data": 1, "valid": True},
        {"description": "a float with zero fractional part is an integer (draft-4 numerics)", "data": 1.0, "valid": True},
        {"description": "a float is not an integer", "data": 1.1, "valid": False},
        {"description": "a string is not an integer", "data": "1", "valid": False},
        {"description": "a boolean is not an integer", "data": True, "valid": False},
        {"description": "null is not an integer", "data": None, "valid": False},
    ]},
    {"description": "number type matches numbers", "schema": {"type": "number"}, "tests": [
        {"description": "an integer is a number", "data": 1, "valid": True},
        {"description": "a float is a number", "data": 1.1, "valid": True},
        {"description": "a boolean is not a number", "data": True, "valid": False},
        {"description": "a string is not a number", "data": "1.1", "valid": False},
    ]},
    {"description": "string type matches strings", "schema": {"type": "string"}, "tests": [
        {"description": "a string is a string", "data": "foo", "valid": True},
        {"description": "an empty string is a string", "data": "", "valid": True},
        {"description": "a number is not a string", "data": 1, "valid": False},
        {"description": "an array is not a string", "data": ["foo"], "valid": False},
    ]},
    {"description": "object type matches objects", "schema": {"type": "object"}, "tests": [
        {"description": "an object is an object", "data": {}, "valid": True},
        {"description": "an array is not an object", "data": [], "valid": False},
        {"description": "null is not an object", "data": None, "valid": False},
    ]},
    {"description": "array type matches arrays", "schema": {"type": "array"}, "tests": [
        {"description": "an array is an array", "data": [1], "valid": True},
        {"description": "an object is not an array", "data": {}, "valid": False},
        {"description": "a string is not an array", "data": "abc", "valid": False},
    ]},
    {"description": "boolean type matches booleans", "schema": {"type": "boolean"}, "tests": [
        {"description": "true is a boolean", "data": True, "valid": True},
        {"description": "false is a boolean", "data": False, "valid": True},
        {"description": "zero is not a boolean", "data": 0, "valid": False},
        {"description": "one is not a boolean", "data": 1, "valid": False},
    ]},
    {"description": "null type matches only null", "schema": {"type": "null"}, "tests": [
        {"description": "null is null", "data": None, "valid": True},
        {"description": "false is not null", "data": False, "valid": False},
        {"description": "zero is not null", "data": 0, "valid": False},
        {"description": "empty string is not null", "data": "", "valid": False},
    ]},
    {"description": "multiple types in an array", "schema": {"type": ["integer", "string"]}, "tests": [
        {"description": "an integer matches", "data": 1, "valid": True},
        {"description": "a string matches", "data": "foo", "valid": True},
        {"description": "a float does not match", "data": 1.5, "valid": False},
        {"description": "an object does not match", "data": {}, "valid": False},
    ]},
]

C["enum"] = [
    {"description": "simple enum validation", "schema": {"enum": [1, 2, 3]}, "tests": [
        {"description": "one of the enum is valid", "data": 1, "valid": True},
        {"description": "float equal to enum integer is valid", "data": 1.0, "valid": True},
        {"description": "something else is invalid", "data": 4, "valid": False},
        {"description": "boolean is not the number 1", "data": True, "valid": False},
    ]},
    {"description": "heterogeneous enum validation", "schema": {"enum": [6, "foo", [], True, {"foo": 12}]}, "tests": [
        {"description": "member object is valid", "data": {"foo": 12}, "valid": True},
        {"description": "member array is valid", "data": [], "valid": True},
        {"description": "member bool is valid", "data": True, "valid": True},
        {"description": "extra-property object is invalid", "data": {"foo": 12, "bar": 1}, "valid": False},
        {"description": "1 is not true", "data": 1, "valid": False},
        {"description": "string not in enum is invalid", "data": "bar", "valid": False},
    ]},
    {"description": "enum with null", "schema": {"enum": [None, 1]}, "tests": [
        {"description": "null is valid", "data": None, "valid": True},
        {"description": "zero is invalid", "data": 0, "valid": False},
    ]},
]

C["pattern"] = [
    {"description": "pattern validation", "schema": {"pattern": "^a*$"}, "tests": [
        {"description": "matching pattern is valid", "data": "aaa", "valid": True},
        {"description": "non-matching is invalid", "data": "abc", "valid": False},
        {"description": "ignores non-strings", "data": True, "valid": True},
        {"description": "ignores numbers", "data": 123, "valid": True},
    ]},
    {"description": "pattern is not anchored", "schema": {"pattern": "a+"}, "tests": [
        {"description": "matches a substring", "data": "xxaayy", "valid": True},
        {"description": "no substring match is invalid", "data": "xyz", "valid": False},
    ]},
]

C["required"] = [
    {"description": "required validation", "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]}, "tests": [
        {"description": "present required property is valid", "data": {"foo": 1}, "valid": True},
        {"description": "non-present required property is invalid", "data": {"bar": 1}, "valid": False},
        {"description": "ignores arrays", "data": [], "valid": True},
        {"description": "ignores strings", "data": "", "valid": True},
        {"description": "property with null value counts as present", "data": {"foo": None}, "valid": True},
    ]},
]

C["uniqueItems"] = [
    {"description": "uniqueItems validation", "schema": {"uniqueItems": True}, "tests": [
        {"description": "unique array of integers is valid", "data": [1, 2], "valid": True},
        {"description": "non-unique array of integers is invalid", "data": [1, 1], "valid": False},
        {"description": "numbers are unique if mathematically unequal", "data": [1.0, 1.00, 1], "valid": False},
        {"description": "true is not equal to one", "data": [1, True], "valid": True},
        {"description": "false is not equal to zero", "data": [0, False], "valid": True},
        {"description": "unique objects are valid", "data": [{"foo": "bar"}, {"foo": "baz"}], "valid": True},
        {"description": "non-unique objects are invalid", "data": [{"foo": "bar"}, {"foo": "bar"}], "valid": False},
        {"description": "nested unique arrays", "data": [["foo"], ["bar"]], "valid": True},
        {"description": "nested non-unique arrays", "data": [["foo"], ["foo"]], "valid": False},
        {"description": "1 and true are unique inside nested arrays", "data": [[1], [True]], "valid": True},
    ]},
]

C["ref"] = [
    {"description": "root pointer ref", "schema": {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False}, "tests": [
        {"description": "match", "data": {"foo": False}, "valid": True},
        {"description": "recursive match", "data": {"foo": {"foo": False}}, "valid": True},
        {"description": "mismatch", "data": {"bar": False}, "valid": False},
        {"description": "recursive mismatch", "data": {"foo": {"bar": False}}, "valid": False},
    ]},
    {"description": "relative pointer ref to object", "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}}, "tests": [
        {"description": "match", "data": {"bar": 3}, "valid": True},
        {"description": "mismatch", "data": {"bar": True}, "valid": False},
    ]},
    {"description": "escaped pointer ref", "schema": {"definitions": {"tilda~field": {"type": "integer"}, "slash/field": {"type": "integer"}, "percent%field": {"type": "integer"}}, "properties": {"tilda": {"$ref": "#/definitions/tilda~0field"}, "slash": {"$ref": "#/definitions/slash~1field"}, "percent": {"$ref": "#/definitions/percent%25field"}}}, "tests": [
        {"description": "slash valid", "data": {"slash": 123}, "valid": True},
        {"description": "tilda valid", "data": {"tilda": 123}, "valid": True},
        {"description": "percent valid", "data": {"percent": 123}, "valid": True},
        {"description": "slash invalid", "data": {"slash": "aoeu"}, "valid": False},
        {"description": "tilda invalid", "data": {"tilda": "aoeu"}, "valid": False},
    ]},
    {"description": "nested refs", "schema": {"definitions": {"a": {"type": "integer"}, "b": {"$ref": "#/definitions/a"}, "c": {"$ref": "#/definitions/b"}}, "$ref": "#/definitions/c"}, "tests": [
        {"description": "nested ref valid", "data": 5, "valid": True},
        {"description": "nested ref invalid", "data": "a", "valid": False},
    ]},
    {"description": "$ref overrides any sibling keywords", "schema": {"definitions": {"reffed": {"type": "array"}}, "properties": {"foo": {"$ref": "#/definitions/reffed", "maxItems": 2}}}, "tests": [
        {"description": "ref valid, maxItems ignored", "data": {"foo": [1, 2, 3]}, "valid": True},
        {"description": "ref invalid", "data": {"foo": "string"}, "valid": False},
    ]},
    {"description": "recursive ref (cycle) terminates on data depth", "schema": {"id": "node", "type": "object", "properties": {"value": {"type": "integer"}, "next": {"$ref": "#"}}, "required": ["value"]}, "tests": [
        {"description": "flat node", "data": {"value": 1}, "valid": True},
        {"description": "deep chain valid", "data": {"value": 1, "next": {"value": 2, "next": {"value": 3}}}, "valid": True},
        {"description": "deep chain invalid leaf", "data": {"value": 1, "next": {"value": "x"}}, "valid": False},
        {"description": "missing required deep", "data": {"value": 1, "next": {}}, "valid": False},
    ]},
    {"description": "location-independent identifier", "schema": {"allOf": [{"$ref": "#foo"}], "definitions": {"A": {"id": "#foo", "type": "integer"}}}, "tests": [
        {"description": "match", "data": 1, "valid": True},
        {"description": "mismatch", "data": "a", "valid": False},
    ]},
]

C["properties"] = [
    {"description": "object properties validation", "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}}, "tests": [
        {"description": "both properties valid", "data": {"foo": 1, "bar": "baz"}, "valid": True},
        {"description": "one invalid", "data": {"foo": 1, "bar": {}}, "valid": False},
        {"description": "both invalid", "data": {"foo": [], "bar": {}}, "valid": False},
        {"description": "doesn't invalidate other types", "data": [], "valid": True},
        {"description": "absent properties valid", "data": {}, "valid": True},
    ]},
    {"description": "properties, patternProperties, additionalProperties interaction", "schema": {"properties": {"foo": {"type": "array", "maxItems": 3}, "bar": {"type": "array"}}, "patternProperties": {"f.o": {"minItems": 2}}, "additionalProperties": {"type": "integer"}}, "tests": [
        {"description": "property validates property", "data": {"foo": [1, 2]}, "valid": True},
        {"description": "property invalidates property", "data": {"foo": [1, 2, 3, 4]}, "valid": False},
        {"description": "patternProperty invalidates property", "data": {"foo": []}, "valid": False},
        {"description": "patternProperty validates nonproperty", "data": {"fxo": [1, 2]}, "valid": True},
        {"description": "patternProperty invalidates nonproperty", "data": {"fxo": []}, "valid": False},
        {"description": "additionalProperty validates others", "data": {"quux": 3}, "valid": True},
        {"description": "additionalProperty invalidates others", "data": {"quux": "foo"}, "valid": False},
    ]},
]

C["patternProperties"] = [
    {"description": "patternProperties validates matching keys", "schema": {"patternProperties": {"f.*o": {"type": "integer"}}}, "tests": [
        {"description": "single match valid", "data": {"foo": 1}, "valid": True},
        {"description": "multiple matches valid", "data": {"foo": 1, "foooooo": 2}, "valid": True},
        {"description": "single invalid match", "data": {"foo": "bar", "fooooo": 2}, "valid": False},
        {"description": "unrelated key ignored", "data": {"xyz": "bar"}, "valid": True},
        {"description": "ignores non-objects", "data": 12, "valid": True},
    ]},
    {"description": "multiple simultaneous patternProperties", "schema": {"patternProperties": {"a*": {"type": "integer"}, "aaa*": {"maximum": 20}}}, "tests": [
        {"description": "single valid", "data": {"a": 21}, "valid": True},
        {"description": "simultaneous valid", "data": {"aaaa": 18}, "valid": True},
        {"description": "one fails", "data": {"a": "bar"}, "valid": False},
        {"description": "other fails", "data": {"aaaa": 31}, "valid": False},
    ]},
]

C["additionalProperties"] = [
    {"description": "additionalProperties false prohibits extras", "schema": {"properties": {"foo": {}, "bar": {}}, "patternProperties": {"^v": {}}, "additionalProperties": False}, "tests": [
        {"description": "no additional is valid", "data": {"foo": 1}, "valid": True},
        {"description": "an additional is invalid", "data": {"foo": 1, "quux": "boom"}, "valid": False},
        {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
        {"description": "patternProperties are not additional", "data": {"foo": 1, "vroom": 2}, "valid": True},
    ]},
    {"description": "additionalProperties as schema", "schema": {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}}, "tests": [
        {"description": "additional valid", "data": {"foo": 1, "bar": True}, "valid": True},
        {"description": "additional invalid", "data": {"foo": 1, "bar": 12}, "valid": False},
    ]},
    {"description": "additionalProperties alone", "schema": {"additionalProperties": {"type": "boolean"}}, "tests": [
        {"description": "valid", "data": {"foo": True}, "valid": True},
        {"description": "invalid", "data": {"foo": 1}, "valid": False},
    ]},
]

C["items"] = [
    {"description": "items as schema", "schema": {"items": {"type": "integer"}}, "tests": [
        {"description": "valid items", "data": [1, 2, 3], "valid": True},
        {"description": "wrong type of items", "data": [1, "x"], "valid": False},
        {"description": "ignores non-arrays", "data": {"foo": "bar"}, "valid": True},
        {"description": "empty array valid", "data": [], "valid": True},
    ]},
    {"description": "items as tuple", "schema": {"items": [{"type": "integer"}, {"type": "string"}]}, "tests": [
        {"description": "correct types", "data": [1, "foo"], "valid": True},
        {"description": "wrong types", "data": ["foo", 1], "valid": False},
        {"description": "incomplete array valid", "data": [1], "valid": True},
        {"description": "array with extra items valid (no additionalItems)", "data": [1, "foo", True], "valid": True},
    ]},
]

C["additionalItems"] = [
    {"description": "additionalItems as schema", "schema": {"items": [{}], "additionalItems": {"type": "integer"}}, "tests": [
        {"description": "additional items match", "data": [None, 2, 3, 4], "valid": True},
        {"description": "additional items mismatch", "data": [None, 2, 3, "foo"], "valid": False},
    ]},
    {"description": "no additional items allowed", "schema": {"items": [{}, {}, {}], "additionalItems": False}, "tests": [
        {"description": "fewer is valid", "data": [1, 2], "valid": True},
        {"description": "equal is valid", "data": [1, 2, 3], "valid": True},
        {"description": "more is invalid", "data": [1, 2, 3, 4], "valid": False},
    ]},
    {"description": "additionalItems ignored with schema-form items", "schema": {"items": {}, "additionalItems": False}, "tests": [
        {"description": "all items valid", "data": [1, 2, 3, 4, 5], "valid": True},
    ]},
]

C["maximum"] = [
    {"description": "maximum validation", "schema": {"maximum": 3.0}, "tests": [
        {"description": "below is valid", "data": 2.6, "valid": True},
        {"description": "boundary is valid", "data": 3.0, "valid": True},
        {"description": "above is invalid", "data": 3.5, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMaximum validation", "schema": {"maximum": 3.0, "exclusiveMaximum": True}, "tests": [
        {"description": "below is valid", "data": 2.2, "valid": True},
        {"description": "boundary is invalid", "data": 3.0, "valid": False},
        {"description": "above is invalid", "data": 3.5, "valid": False},
    ]},
]

C["minimum"] = [
    {"description": "minimum validation", "schema": {"minimum": 1.1}, "tests": [
        {"description": "above is valid", "data": 2.6, "valid": True},
        {"description": "boundary is valid", "data": 1.1, "valid": True},
        {"description": "below is invalid", "data": 0.6, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMinimum validation", "schema": {"minimum": 1.1, "exclusiveMinimum": True}, "tests": [
        {"description": "above is valid", "data": 1.2, "valid": True},
        {"description": "boundary is invalid", "data": 1.1, "valid": False},
        {"description": "below is invalid", "data": 0.6, "valid": False},
    ]},
]

C["maxLength"] = [
    {"description": "maxLength validation", "schema": {"maxLength": 2}, "tests": [
        {"description": "shorter is valid", "data": "f", "valid": True},
        {"description": "exact is valid", "data": "fo", "valid": True},
        {"description": "longer is invalid", "data": "foo", "valid": False},
        {"description": "ignores non-strings", "data": 100, "valid": True},
        {"description": "counts code points not bytes", "data": "éé", "valid": True},
    ]},
]

C["minLength"] = [
    {"description": "minLength validation", "schema": {"minLength": 2}, "tests": [
        {"description": "longer is valid", "data": "foo", "valid": True},
        {"description": "exact is valid", "data": "fo", "valid": True},
        {"description": "shorter is invalid", "data": "f", "valid": False},
        {"description": "ignores non-strings", "data": 1, "valid": True},
        {"description": "counts code points", "data": "é", "valid": False},
    ]},
]

C["maxItems"] = [
    {"description": "maxItems validation", "schema": {"maxItems": 2}, "tests": [
        {"description": "shorter is valid", "data": [1], "valid": True},
        {"description": "exact is valid", "data": [1, 2], "valid": True},
        {"description": "longer is invalid", "data": [1, 2, 3], "valid": False},
        {"description": "ignores non-arrays", "data": "foobar", "valid": True},
    ]},
]

C["minItems"] = [
    {"description": "minItems validation", "schema": {"minItems": 1}, "tests": [
        {"description": "longer is valid", "data": [1, 2], "valid": True},
        {"description": "exact is valid", "data": [1], "valid": True},
        {"description": "shorter is invalid", "data": [], "valid": False},
        {"description": "ignores non-arrays", "data": "", "valid": True},
    ]},
]

C["maxProperties"] = [
    {"description": "maxProperties validation", "schema": {"maxProperties": 2}, "tests": [
        {"description": "shorter is valid", "data": {"foo": 1}, "valid": True},
        {"description": "exact is valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "more is invalid", "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False},
        {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
        {"description": "ignores strings", "data": "foobar", "valid": True},
    ]},
]

C["minProperties"] = [
    {"description": "minProperties validation", "schema": {"minProperties": 1}, "tests": [
        {"description": "longer is valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "exact is valid", "data": {"foo": 1}, "valid": True},
        {"description": "empty object invalid", "data": {}, "valid": False},
        {"description": "ignores arrays", "data": [], "valid": True},
        {"description": "ignores null", "data": None, "valid": True},
    ]},
]

C["multipleOf"] = [
    {"description": "by int", "schema": {"multipleOf": 2}, "tests": [
        {"description": "int multiple is valid", "data": 10, "valid": True},
        {"description": "int non-multiple is invalid", "data": 7, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "by number", "schema": {"multipleOf": 1.5}, "tests": [
        {"description": "zero is multiple of anything", "data": 0, "valid": True},
        {"description": "4.5 is multiple of 1.5", "data": 4.5, "valid": True},
        {"description": "35 is not multiple of 1.5", "data": 35, "valid": False},
    ]},
    {"description": "by small number", "schema": {"multipleOf": 0.0001}, "tests": [
        {"description": "0.0075 is multiple of 0.0001", "data": 0.0075, "valid": True},
        {"description": "0.00751 is not multiple of 0.0001", "data": 0.00751, "valid": False},
    ]},
]

C["dependencies"] = [
    {"description": "dependencies (property form)", "schema": {"dependencies": {"bar": ["foo"]}}, "tests": [
        {"description": "neither present", "data": {}, "valid": True},
        {"description": "nondependant", "data": {"foo": 1}, "valid": True},
        {"description": "with dependency", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "missing dependency", "data": {"bar": 2}, "valid": False},
        {"description": "ignores arrays", "data": ["bar"], "valid": True},
    ]},
    {"description": "multiple dependencies", "schema": {"dependencies": {"quux": ["foo", "bar"]}}, "tests": [
        {"description": "all present", "data": {"foo": 1, "bar": 2, "quux": 3}, "valid": True},
        {"description": "missing one", "data": {"foo": 1, "quux": 3}, "valid": False},
        {"description": "missing both", "data": {"quux": 3}, "valid": False},
    ]},
    {"description": "dependencies (schema form)", "schema": {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}}}}}, "tests": [
        {"description": "valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "no dependency", "data": {"foo": "quux"}, "valid": True},
        {"description": "wrong type", "data": {"foo": "quux", "bar": 2}, "valid": False},
        {"description": "wrong type both", "data": {"foo": "quux", "bar": "quux"}, "valid": False},
    ]},
]

C["allOf"] = [
    {"description": "allOf", "schema": {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]}, {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]}, "tests": [
        {"description": "allOf valid", "data": {"foo": "baz", "bar": 2}, "valid": True},
        {"description": "mismatch second", "data": {"foo": "baz"}, "valid": False},
        {"description": "mismatch first", "data": {"bar": 2}, "valid": False},
        {"description": "wrong type", "data": {"foo": "baz", "bar": "quux"}, "valid": False},
    ]},
    {"description": "allOf with base schema", "schema": {"properties": {"bar": {"type": "integer"}}, "required": ["bar"], "allOf": [{"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]}, "tests": [
        {"description": "valid", "data": {"foo": "quux", "bar": 2}, "valid": True},
        {"description": "mismatch base", "data": {"foo": "quux"}, "valid": False},
        {"description": "mismatch branch", "data": {"bar": 2}, "valid": False},
    ]},
]

C["anyOf"] = [
    {"description": "anyOf", "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first valid", "data": 1, "valid": True},
        {"description": "second valid", "data": 2.5, "valid": True},
        {"description": "both valid", "data": 3, "valid": True},
        {"description": "neither valid", "data": 1.5, "valid": False},
    ]},
    {"description": "anyOf with base schema", "schema": {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]}, "tests": [
        {"description": "one branch valid", "data": "foobar", "valid": True},
        {"description": "both branches invalid", "data": "foo", "valid": False},
        {"description": "base invalid", "data": 3, "valid": False},
    ]},
]

C["oneOf"] = [
    {"description": "oneOf", "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first valid", "data": 1, "valid": True},
        {"description": "second valid", "data": 2.5, "valid": True},
        {"description": "both valid is invalid", "data": 3, "valid": False},
        {"description": "neither valid", "data": 1.5, "valid": False},
    ]},
    {"description": "oneOf with required", "schema": {"type": "object", "oneOf": [{"required": ["foo", "bar"]}, {"required": ["foo", "baz"]}]}, "tests": [
        {"description": "both invalid", "data": {"bar": 2}, "valid": False},
        {"description": "first valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "second valid", "data": {"foo": 1, "baz": 3}, "valid": True},
        {"description": "both valid is invalid", "data": {"foo": 1, "bar": 2, "baz": 3}, "valid": False},
    ]},
]

C["not"] = [
    {"description": "not", "schema": {"not": {"type": "integer"}}, "tests": [
        {"description": "allowed", "data": "foo", "valid": True},
        {"description": "disallowed", "data": 1, "valid": False},
    ]},
    {"description": "not multiple types", "schema": {"not": {"type": ["integer", "boolean"]}}, "tests": [
        {"description": "string valid", "data": "foo", "valid": True},
        {"description": "integer invalid", "data": 1, "valid": False},
        {"description": "boolean invalid", "data": True, "valid": False},
    ]},
    {"description": "not more complex", "schema": {"not": {"type": "object", "properties": {"foo": {"type": "string"}}}}, "tests": [
        {"description": "match", "data": 1, "valid": True},
        {"description": "other match", "data": {"foo": 1}, "valid": True},
        {"description": "mismatch", "data": {"foo": "bar"}, "valid": False},
    ]},
]

C["format"] = [
    {"description": "date-time format", "schema": {"format": "date-time"}, "tests": [
        {"description": "valid date-time", "data": "1963-06-19T08:30:06.283185Z", "valid": True},
        {"description": "valid with offset", "data": "1963-06-19T08:30:06+02:00", "valid": True},
        {"description": "invalid: date only", "data": "1963-06-19", "valid": False},
        {"description": "invalid string", "data": "not a date", "valid": False},
        {"description": "ignores non-strings", "data": 12, "valid": True},
    ]},
    {"description": "email format", "schema": {"format": "email"}, "tests": [
        {"description": "valid email", "data": "joe.bloggs@example.com", "valid": True},
        {"description": "invalid email", "data": "2962", "valid": False},
    ]},
    {"description": "ipv4 format", "schema": {"format": "ipv4"}, "tests": [
        {"description": "valid ipv4", "data": "192.168.0.1", "valid": True},
        {"description": "too many components", "data": "127.0.0.0.1", "valid": False},
        {"description": "out of range", "data": "256.256.256.256", "valid": False},
    ]},
    {"description": "ipv6 format", "schema": {"format": "ipv6"}, "tests": [
        {"description": "valid ipv6", "data": "::1", "valid": True},
        {"description": "out of range", "data": "12345::", "valid": False},
        {"description": "not ipv6", "data": "fuzzy", "valid": False},
    ]},
    {"description": "hostname format", "schema": {"format": "hostname"}, "tests": [
        {"description": "valid hostname", "data": "www.example.com", "valid": True},
        {"description": "leading hyphen invalid", "data": "-a-host-name", "valid": False},
    ]},
    {"description": "uri format", "schema": {"format": "uri"}, "tests": [
        {"description": "valid uri", "data": "http://example.com/x", "valid": True},
        {"description": "scheme-less invalid", "data": "//example.com", "valid": False},
    ]},
]

C["default"] = [
    {"description": "default values are not validation constraints", "schema": {"properties": {"foo": {"type": "integer", "default": []}}}, "tests": [
        {"description": "valid when property present", "data": {"foo": 13}, "valid": True},
        {"description": "still valid when absent (default ignored by validation)", "data": {}, "valid": True},
    ]},
]


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    for name, groups in C.items():
        with open(os.path.join(HERE, f"{name}.json"), "w") as f:
            json.dump(groups, f, indent=1)
    total = sum(len(t["tests"]) for gs in C.values() for t in gs)
    print(f"wrote {len(C)} files, {total} cases to {HERE}")


if __name__ == "__main__":
    main()
