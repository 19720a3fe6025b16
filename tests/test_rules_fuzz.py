"""Property fuzz for the ruler rule-group model and store.

The YAML round-trip mirrors the reference's yaml.v3 marshal/unmarshal
pair (ruler/model.go struct tags, controller.go:44-52), and the store
semantics mirror ReplacingMergeTree + tombstones (service.go:43-101):
a random op sequence applied to the store must match a dict-based
model of "last write wins, tombstones soft-delete"."""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gigapipe_spark.storage.writer import Catalog
from gigapipe_spark.streaming.rules import (
    Rule,
    RuleGroup,
    RuleStore,
    group_from_yaml,
    group_to_yaml,
)

_name = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N"), whitelist_characters="-_.: "
    ),
    min_size=1,
    max_size=24,
).map(str.strip).filter(bool)

_labels = st.dictionaries(_name, _name, max_size=3)

_rule = st.builds(
    Rule,
    record=st.one_of(st.just(""), _name),
    alert=st.one_of(st.just(""), _name),
    expr=st.text(min_size=1, max_size=60).filter(lambda s: s.strip()),
    for_=st.sampled_from(["", "5m", "1h30m", "0s", "0"]),
    labels=_labels,
    annotations=_labels,
)

_group = st.builds(
    RuleGroup,
    name=_name,
    interval=st.sampled_from(["", "1s", "30s", "1m", "1m30s", "soon"]),
    rules=st.lists(_rule, max_size=4),
)


@given(_group)
@settings(max_examples=150, deadline=None)
def test_yaml_roundtrip_is_identity(group):
    back = group_from_yaml(group_to_yaml(group))
    assert back.to_dict() == group.to_dict()


@given(_group)
@settings(max_examples=50, deadline=None)
def test_yaml_omitempty(group):
    import yaml as _yaml

    data = _yaml.safe_load(group_to_yaml(group))
    for i, r in enumerate(group.rules):
        d = data["rules"][i]
        for key, val in (
            ("record", r.record),
            ("alert", r.alert),
            ("for", r.for_),
            ("labels", r.labels),
            ("annotations", r.annotations),
        ):
            assert (key in d) == bool(val)


# op = ("set", ns, group) | ("del_group", ns, name) | ("del_ns", ns)
_ns = st.sampled_from(["ns-a", "ns-b", "ns-c"])
_gname = st.sampled_from(["g1", "g2", "g3"])
_op = st.one_of(
    st.tuples(st.just("set"), _ns, _gname, st.sampled_from(["e1", "e2", "e3"])),
    st.tuples(st.just("del_group"), _ns, _gname),
    st.tuples(st.just("del_ns"), _ns),
)


@given(st.lists(_op, min_size=1, max_size=25))
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_store_matches_model(ops):
    with tempfile.TemporaryDirectory() as root:
        store = RuleStore(None, Catalog(root + "/store"), "loki")
        model: dict[tuple[str, str], str] = {}  # (ns, group) -> expr
        for op in ops:
            if op[0] == "set":
                _, ns, name, expr = op
                store.set_rule_group(
                    ns,
                    RuleGroup(
                        name=name,
                        interval="1m",
                        rules=[Rule(record="r", expr=expr)],
                    ),
                )
                model[(ns, name)] = expr
            elif op[0] == "del_group":
                _, ns, name = op
                store.delete_rule_group(ns, name)
                model.pop((ns, name), None)
            else:
                _, ns = op
                store.delete_namespace(ns)
                for k in [k for k in model if k[0] == ns]:
                    del model[k]
        got = {
            (ns, g.name): g.rules[0].expr
            for ns, gs in store.get_all_rule_groups().items()
            for g in gs
        }
        assert got == model
        # per-namespace and single-group reads agree with the model
        for ns in {"ns-a", "ns-b", "ns-c"}:
            listed = {g.name for g in store.list_rule_groups(ns)}
            assert listed == {k[1] for k in model if k[0] == ns}
        for (ns, name), expr in model.items():
            g = store.get_rule_group(ns, name)
            assert g is not None and g.rules[0].expr == expr
