"""Error-injection operators (reference package core, SURVEY.md §2.2).

Import the op modules for their registration side effects."""

from .base import REGISTRY, BatchCtx, ErrorOp, ErrorSpec, register  # noqa: F401
from . import edit, field, lookup, dates, dup  # noqa: F401,E402
from .injector import Injector, extract_ledger, strip_ledger  # noqa: F401
