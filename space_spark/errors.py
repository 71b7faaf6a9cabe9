"""Exception types (parity: reference errors.py, e.g. PrimaryKeyExistError
raised by insert — /root/reference/python/src/space/core/ops/insert.py:119-134)."""


class SpaceError(Exception):
    """Base class for all space_spark errors."""


class SchemaError(SpaceError):
    """Invalid schema / primary key / record field declaration."""


class PrimaryKeyExistError(SpaceError):
    """``insert`` found input primary keys that already exist."""


class TransactionConflictError(SpaceError):
    """Optimistic commit aborted: another writer moved the branch head."""


class VersionNotFoundError(SpaceError):
    """Unknown snapshot id / tag / branch."""


class UserInputError(SpaceError):
    """Invalid argument to a public API."""


class ConstraintViolationError(SpaceError):
    """A write contained rows that violate a table CHECK constraint."""
