"""Plugin registry seams (ref: reader/plugins/plugins.go; SURVEY §2.9)."""

from __future__ import annotations

import pytest

from gigapipe_spark import plugins
from gigapipe_spark.logql.compiler import LogQLContext, query
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    plugins.unregister_plugin(plugins.MACRO, "_errors_of")
    plugins.unregister_plugin(plugins.LOGQL_PLANNER, "shortcut")


def test_consult_fall_through():
    def declines(*a):
        raise plugins.NotApplicable()

    plugins.register_plugin(plugins.LOGQL_PLANNER, "shortcut", declines)
    assert plugins.consult(plugins.LOGQL_PLANNER, "x") is None


def test_macro_expansion_text():
    plugins.register_macro(
        "_errors_of", lambda app: f'{{app="{app}", level="error"}}'
    )
    out = plugins.expand_macros('sum(count_over_time(_errors_of("web")[1h]))')
    assert out == 'sum(count_over_time({app="web", level="error"}[1h]))'
    # unregistered macro-shaped text is left alone
    assert plugins.expand_macros('_nope("x")') == '_nope("x")'
    # builtin _over_time names never match the macro shape
    assert plugins.expand_macros("count_over_time({a=\"b\"}[1m])") == (
        'count_over_time({a="b"}[1m])'
    )


def test_macro_through_logql_query(spark):
    plugins.register_macro("_errs", lambda: '{level="error"}')
    try:
        ctx = LogQLContext(spark, SF_DIR)
        direct = query(ctx, '{level="error"}').df
        via_macro = query(ctx, "_errs()").df
        assert via_macro.count() == direct.count() > 0
    finally:
        plugins.unregister_plugin(plugins.MACRO, "_errs")


def test_planner_plugin_wins(spark):
    ctx = LogQLContext(spark, SF_DIR)
    sentinel = query(ctx, '{level="error"}')

    def shortcut(c, text):
        if text != "__shortcut__":
            raise plugins.NotApplicable()
        return sentinel

    plugins.register_plugin(plugins.LOGQL_PLANNER, "shortcut", shortcut)
    assert query(ctx, "__shortcut__") is sentinel
    # normal queries still take the built-in path
    assert query(ctx, '{level="info"}') is not sentinel
