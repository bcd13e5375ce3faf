from hyrise_tpu.concurrency.transaction import (  # noqa: F401
    TransactionContext,
    TransactionManager,
    TransactionPhase,
)
