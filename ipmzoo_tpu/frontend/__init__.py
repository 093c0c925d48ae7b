"""Front ends: CLI demos, LaTeX emitters, static derivation-explorer site."""

from .latex import (NewtonSystemLatex, NewtonSystemsLatex,
                    render_first_order_conditions, render_lagrangian,
                    render_newton_system, render_newton_systems,
                    render_problem)

__all__ = ["NewtonSystemLatex", "NewtonSystemsLatex",
           "render_first_order_conditions", "render_lagrangian",
           "render_newton_system", "render_newton_systems",
           "render_problem"]
