"""Workload registry — the framework face mirroring the reference's tests.

The reference registers interactive ``TestBase`` workloads in a
``TestsLayerManager`` with a launcher menu and a duplicate-name guard
(``TestsLayerManager.cpp:31-41, 267-303``); here every workload is a named,
deterministic, scriptable scenario (SURVEY.md §4) run from the CLI or tests.
"""

from raytracing_tests_tpu.models.registry import (  # noqa: F401
    Workload,
    get_workload,
    list_workloads,
    register,
)
from raytracing_tests_tpu.models import workloads  # noqa: F401  (registers all)
