from hyrise_tpu.plan import lqp  # noqa: F401
from hyrise_tpu.plan.translator import translate_lqp  # noqa: F401
from hyrise_tpu.plan.optimizer import Optimizer  # noqa: F401
