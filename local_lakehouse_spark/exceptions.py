"""Exception types matching the reference's error surface.

Parity: /root/reference/uchelper/exceptions.py:6-28 defines
AlreadyExistsError, DoesNotExistError, UnsupportedOperationError,
SchemaMismatchError, DuckDBConnectionSetupError. We keep the same
names/semantics; the last one is generalized to the SQL-engine setup
failure of our Spark-backed client.
"""


class LakehouseError(Exception):
    """Base class for all engine errors."""


class AlreadyExistsError(LakehouseError):
    """Catalog/schema/table with this name already exists."""


class DoesNotExistError(LakehouseError):
    """Catalog/schema/table does not exist."""


class UnsupportedOperationError(LakehouseError):
    """Operation not supported for this format/mode combination."""


class SchemaMismatchError(LakehouseError):
    """DataFrame schema does not match the table schema in the catalog."""


class SQLEngineSetupError(LakehouseError):
    """SQL execution engine (SparkSession) was not set up correctly."""


# Backwards-compatible alias mirroring the reference's name
# (/root/reference/uchelper/exceptions.py:24-28).
DuckDBConnectionSetupError = SQLEngineSetupError


class ConstraintViolationError(LakehouseError):
    """A write would violate a table CHECK constraint (beyond the
    reference — Delta-style governance for any format)."""


class MergeAmbiguityError(LakehouseError):
    """Multiple source rows matched one target row in a MERGE with
    matched-clauses — the update/delete would be nondeterministic.
    Mirrors Delta/delta-rs's multiple-source-rows-matched error so the
    PARQUET merge path keeps DELTA semantics."""
