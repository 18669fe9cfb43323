"""patterns_devkit_spark — a PySpark-native pipeline engine with the
query/data-processing capabilities of patterns-app/patterns-devkit.

Public surface mirrors the reference's exports
(reference: patterns/__init__.py:1-18): Table, TableVersion, Stream,
State, Parameter, Connection, respond_to_request — plus the engine
pieces the reference keeps server-side (Engine, Catalog, GraphSpec,
GraphRunner) and the north-star operator library (operators/).
"""
from .catalog.catalog import ConcurrentWriteError
from .node.matview import MaterializedView
from .node.node import (
    BranchMergeConflict,
    CheckConstraintViolation,
    Connection,
    Engine,
    NodeContext,
    Parameter,
    State,
    Stream,
    Table,
    TableVersion,
    current_engine,
    respond_to_request,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "BranchMergeConflict",
    "CheckConstraintViolation",
    "ConcurrentWriteError",
    "MaterializedView",
    "Connection",
    "Engine",
    "NodeContext",
    "Parameter",
    "State",
    "Stream",
    "Table",
    "TableVersion",
    "current_engine",
    "respond_to_request",
    "get_spark",
    "__version__",
]
