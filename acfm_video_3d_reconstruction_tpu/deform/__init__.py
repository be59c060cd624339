from .solve import lbs_from_logits, screened_poisson_solve  # noqa: F401
