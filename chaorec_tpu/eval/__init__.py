from chaorec_tpu.eval.ranking import gene_ranklist  # noqa: F401
from chaorec_tpu.eval.metrics import gene_metrics, compute_metrics  # noqa: F401
