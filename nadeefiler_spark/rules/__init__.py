from .base import Rule, RuleContext, topo_sort  # noqa: F401
