from climb_tpu.evaluation.cl_eval import (
    upstream_knowledge_transfer_eval,
    catastrophic_forgetting_eval,
    relative_gain,
    forgetting_percentage,
)

__all__ = [
    "upstream_knowledge_transfer_eval",
    "catastrophic_forgetting_eval",
    "relative_gain",
    "forgetting_percentage",
]
