"""Cross-language filter-ID parity: Python seeded_hash vs Node.js.

The reference computes IDs as HMAC-SHA256(seed, json-stable-stringify(obj))
(/root/reference/lib/util/hash.js:25-30, lib/index.ts:187). The risky
parts of reproducing that in Python are JavaScript's Number::toString
formatting and JSON string escaping — so this test computes the same IDs
in a Node subprocess using the NATIVE JSON.stringify for scalars/keys (the
exact code json-stable-stringify delegates to) plus its documented
sorted-key object walk, and compares hex digests byte-for-byte.

Skipped when node is not on PATH.
"""

import json
import shutil
import subprocess

import pytest

from koncorde_spark import Koncorde
from koncorde_spark.normalize import DEFAULT_SEED, seeded_hash
from koncorde_spark.normalize.standardize import NormalizedExists

node = shutil.which("node")
pytestmark = pytest.mark.skipif(node is None, reason="node not available")

NODE_SCRIPT = r"""
const { createHmac } = require('crypto');
// json-stable-stringify semantics: sorted keys, native JSON.stringify
// for scalars and keys (the npm package delegates to JSON.stringify).
function stable(obj) {
  if (obj === null || typeof obj !== 'object') return JSON.stringify(obj);
  if (Array.isArray(obj)) return '[' + obj.map(stable).join(',') + ']';
  const keys = Object.keys(obj).sort();
  const parts = [];
  for (const k of keys) {
    const v = stable(obj[k]);
    if (v !== undefined) parts.push(JSON.stringify(k) + ':' + v);
  }
  return '{' + parts.join(',') + '}';
}
const seed = Buffer.from(process.argv[1], 'hex');
const objs = JSON.parse(require('fs').readFileSync(0, 'utf8'));
for (const o of objs) {
  process.stdout.write(
    createHmac('SHA256', seed).update(Buffer.from(stable(o))).digest('hex') + '\n');
}
"""


def node_hashes(objs):
    out = subprocess.run(
        [node, "-e", NODE_SCRIPT, DEFAULT_SEED.hex()],
        input=json.dumps(objs),
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.split()


def plainify(obj):
    """NormalizedExists → its serialized dict form for the JSON channel."""
    if isinstance(obj, NormalizedExists):
        return {"path": obj.path, "array": obj.array, "value": obj.value}
    if isinstance(obj, dict):
        return {k: plainify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [plainify(v) for v in obj]
    return obj


EDGE_OBJECTS = [
    {"filter": [[{"equals": {"foo": "bar"}, "not": False}]], "index": None},
    {"a": 1, "b": 1.5, "c": -0.25, "d": 1e21, "e": 123456789012345680.0, "f": 1e-7},
    {"z": None, "y": True, "x": False, "w": [1, 2.5, "three", None]},
    {"s": 'quote " backslash \\ newline \n tab \t unicode é ★'},
    {"nested": {"deep": [{"k2": 2, "k1": 1}, []], "empty": {}}},
    {"num_int_float": [5, 5.0, 0.1, 100.0, -42]},
]


def test_edge_values_hash_identically():
    py = [seeded_hash(DEFAULT_SEED, o) for o in EDGE_OBJECTS]
    js = node_hashes(EDGE_OBJECTS)
    assert py == js


def test_real_filter_ids_match_node():
    """End-to-end: the DNFs our normalizer produces hash to the same IDs
    a reference-faithful Node hasher derives from the same DNF."""
    filters = [
        {"equals": {"foo": "bar"}},
        {"equals": {"n": 42}},
        {"equals": {"x": 1.5}},
        {"not": {"equals": {"foo": None}}},
        {"range": {"v": {"gte": 0.5, "lt": 100}}},
        {"exists": "a.b"},
        {"exists": 'tags["x"]'},
        {"in": {"lang": ["en", "de"]}},
        {"regexp": {"s": {"value": "^a+b", "flags": "i"}}},
        {"and": [{"equals": {"a": 1}}, {"exists": "b"}]},
        {"or": [{"equals": {"a": 1}}, {"range": {"a": {"gt": 5}}}]},
        {"geoBoundingBox": {"pos": {"top": 10, "left": -10, "bottom": -10, "right": 10}}},
    ]
    k = Koncorde()
    ids, wrappers = [], []
    for f in filters:
        nf = k.normalize(f)
        ids.append(nf.filter_id)
        wrappers.append(plainify({"filter": nf.dnf, "index": None}))
    assert ids == node_hashes(wrappers)


def test_number_formatting_fuzz_vs_node():
    """js_number_repr must equal JavaScript's Number::toString for every
    double: random bit patterns + magnitude sweeps, checked against node's
    native JSON.stringify."""
    import random
    import struct

    from koncorde_spark.normalize.jsonstable import js_number_repr

    random.seed(20260816)
    vals = [
        1e-7, 1.25e-5, 1e-6, 0.00001, 0.0001, 1e21, 1.5e21, -2.5e-7,
        123456789012345680.0, 5e-324, 1.7976931348623157e308, -0.0,
        3.141592653589793, 1e16, 1.0000000000000002,
        2.7890840981819507e20, -1.6130484589462314e17,
    ]
    for _ in range(500):
        vals.append(struct.unpack("d", struct.pack("Q", random.getrandbits(64)))[0])
        vals.append(float(random.randint(-(10**20), 10**20)))
        vals.append(random.uniform(-1e22, 1e22))
    vals = [v for v in vals if v == v and abs(v) != float("inf")]
    out = subprocess.run(
        [node, "-e",
         "JSON.parse(require('fs').readFileSync(0,'utf8'))"
         ".forEach(v=>console.log(JSON.stringify(v)))"],
        input=json.dumps(vals), capture_output=True, text=True, check=True,
    )
    js = out.stdout.split("\n")
    bad = [(v, js_number_repr(v), j) for v, j in zip(vals, js) if js_number_repr(v) != j]
    assert not bad, bad[:5]


def test_named_index_id_matches_node():
    k = Koncorde()
    nf = k.normalize({"equals": {"a": 1}}, "myindex")
    want = node_hashes([plainify({"filter": nf.dnf, "index": "myindex"})])[0]
    assert nf.filter_id == want
