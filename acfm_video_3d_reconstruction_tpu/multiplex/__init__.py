from .state import (  # noqa: F401
    MultiplexState,
    gather_cameras,
    gather_deforms,
    gather_probs,
    init_az_el_multiplex,
    init_quat_multiplex,
    scatter_probs,
    select_hypotheses,
    topk_hypotheses,
)
