"""Rule-group model + store: the Loki-ruler config API surface.

The reference stores namespaced YAML rule groups and evaluates only the
recording rules in them (ref: ruler/model.go:8-36 Rule/RuleGroup/
NamespaceRuleGroups; ruler/manager.go:53 "recording-only: alerting rules
are never evaluated"; router/router.go:18-31 CRUD routes; rule static
labels merged into the written-back series, manager.go:244). This module
re-derives that surface: a namespace → groups store with YAML round-trip
and a loader that registers each group's recording rules on the Ruler.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from gigapipe_spark.logql.ast import DURATION_UNITS_NS
from gigapipe_spark.streaming.ruler import RecordingRule, Ruler


@dataclass
class Rule:
    """One recording or alerting rule (ref: model.go:8-16). Only
    recording rules (non-empty `record`) are evaluated; alerting rules
    are accepted and stored but never run (manager.go:53)."""

    expr: str
    record: str = ""
    alert: str = ""
    for_: str = ""
    labels: dict[str, str] = field(default_factory=dict)
    annotations: dict[str, str] = field(default_factory=dict)
    lang: str = "logql"  # "logql" | "promql" evaluator kind

    def is_recording(self) -> bool:
        return self.record != ""


@dataclass
class RuleGroup:
    name: str
    rules: list[Rule]
    interval: str = "1m"

    def interval_ns(self) -> int:
        import re

        total = 0
        for m in re.finditer(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)", self.interval):
            total += int(float(m.group(1)) * DURATION_UNITS_NS[m.group(2)])
        return total or 60_000_000_000


class RuleStore:
    """Namespace → rule groups, with the Loki ruler API's CRUD verbs
    (router.go:18-23) and YAML round-trip (the reference serializes the
    groups as YAML into its rules table's config column)."""

    def __init__(self) -> None:
        self._ns: dict[str, dict[str, RuleGroup]] = {}

    # --- reads
    def all_rules(self) -> dict[str, list[RuleGroup]]:
        return {ns: list(groups.values()) for ns, groups in self._ns.items()}

    def rules_by_namespace(self, namespace: str) -> list[RuleGroup]:
        return list(self._ns.get(namespace, {}).values())

    def get_rule_group(self, namespace: str, group: str) -> RuleGroup | None:
        return self._ns.get(namespace, {}).get(group)

    # --- writes
    def set_rule_group(self, namespace: str, group: RuleGroup) -> None:
        self._ns.setdefault(namespace, {})[group.name] = group

    def delete_rule_group(self, namespace: str, group: str) -> None:
        self._ns.get(namespace, {}).pop(group, None)

    def delete_namespace(self, namespace: str) -> None:
        self._ns.pop(namespace, None)

    # --- YAML round-trip (config-column format)
    def to_yaml(self, namespace: str) -> str:
        import yaml

        groups = []
        for g in self.rules_by_namespace(namespace):
            rules = []
            for r in g.rules:
                d: dict = {"expr": r.expr}
                if r.record:
                    d["record"] = r.record
                if r.alert:
                    d["alert"] = r.alert
                if r.for_:
                    d["for"] = r.for_
                if r.labels:
                    d["labels"] = dict(r.labels)
                if r.annotations:
                    d["annotations"] = dict(r.annotations)
                if r.lang != "logql":
                    d["lang"] = r.lang
                rules.append(d)
            groups.append({"name": g.name, "interval": g.interval, "rules": rules})
        return yaml.safe_dump({"groups": groups}, sort_keys=False)

    def load_yaml(self, namespace: str, text: str) -> None:
        import yaml

        doc = yaml.safe_load(text) or {}
        for g in doc.get("groups", []):
            rules = [
                Rule(
                    expr=r.get("expr", ""),
                    record=r.get("record", ""),
                    alert=r.get("alert", ""),
                    for_=r.get("for", ""),
                    labels=dict(r.get("labels", {}) or {}),
                    annotations=dict(r.get("annotations", {}) or {}),
                    lang=r.get("lang", "logql"),
                )
                for r in g.get("rules", [])
            ]
            self.set_rule_group(
                namespace,
                RuleGroup(
                    name=g.get("name", ""),
                    interval=g.get("interval", "1m") or "1m",
                    rules=rules,
                ),
            )


def load_into_ruler(store: RuleStore, ruler: Ruler) -> int:
    """Register every RECORDING rule on the Ruler (alerting rules are
    skipped, mirroring manager.go:53); the rule's static labels ride
    along and are merged into the written-back series (manager.go:244).
    Returns the number of rules registered."""
    n = 0
    for groups in store.all_rules().values():
        for g in groups:
            for r in g.rules:
                if not r.is_recording():
                    continue
                ruler.add_rule(
                    RecordingRule(
                        name=r.record,
                        query=r.expr,
                        interval_ns=g.interval_ns(),
                        lang=r.lang,
                        static_labels=dict(r.labels),
                    )
                )
                n += 1
    return n
