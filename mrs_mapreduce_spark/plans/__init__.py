"""Plan inspection utilities (SURVEY.md §4).

The reference has no optimizer (``mrs/runner.py`` executes the user DAG
verbatim); this engine delegates planning to Catalyst and *verifies* the
resulting physical plans instead — these helpers power
``tests/test_scale_plans.py`` and the generated PLANS.md report.
"""

from .explain import executed_plan, formatted_plan, plan_flags  # noqa: F401
