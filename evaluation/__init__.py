"""Top-level shim matching the reference repo layout (evaluation/): the real
package is carle_tpu.evaluation.  Import order on machines that also have the
PyTorch reference on sys.path is ambiguous for a bare `evaluation` package;
prefer `from carle_tpu.evaluation import eval, submission`."""

from carle_tpu.evaluation import eval, submission  # noqa: F401
from carle_tpu.evaluation.submission import DemoAgent, SubmissionAgent  # noqa: F401
