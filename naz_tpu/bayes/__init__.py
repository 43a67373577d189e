from naz_tpu.bayes.wrapper import (
    BayesianFlow,
    make_flow_loglik,
)

__all__ = ["BayesianFlow", "make_flow_loglik"]
