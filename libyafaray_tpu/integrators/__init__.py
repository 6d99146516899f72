"""Surface + volume integrators (replaces src/integrator/*)."""
from .mc import IntegratorConfig, integrate, make_integrator

__all__ = ["IntegratorConfig", "integrate", "make_integrator"]
