"""Record-linkage pipeline: blocking → in-block pairwise scoring →
transitive clustering → pairwise metrics (SURVEY.md §2.3, §7.3 steps
4-8)."""

from .blocking import LinkageConfig, band_rows_from_payload, node_payload  # noqa: F401
from .scoring import candidate_pairs, score_pairs_broadcast, score_pairs_join  # noqa: F401
from .clustering import cluster_edges  # noqa: F401
from .metrics import pairwise_f1  # noqa: F401
from .pipeline import link_datasets  # noqa: F401
from .models import (  # noqa: F401
    fit_mlp,
    fit_random_forest,
    fit_svm_rff,
    learning_curve,
    model_zoo_report,
    predict_links_model,
)
