"""Front ends: LaTeX renderers, CLI demos, web-site generator."""

import json
import os
import subprocess
import sys

import pytest

from ipmzoo_tpu.formulations import (Bounds, InequalityHandling,
                                     ProblemStage, Settings)
from ipmzoo_tpu.frontend.latex import (render_first_order_conditions,
                                       render_lagrangian,
                                       render_newton_systems, render_problem)


class TestLatex:
    def test_newton_systems_bundle(self):
        systems = render_newton_systems(Settings())
        # the cosmetic 1 -> I rewrite appears in the full system lhs
        assert "-I" in systems.full.lhs
        # augmented system has a 2x2 matrix body: one '&' per row
        rows = [r for r in systems.augmented.lhs.split("\\\\") if r.strip()]
        assert len(rows) == 2
        assert all(r.count("&") == 1 for r in rows)
        assert systems.normal.lhs.count("&") == 0
        # shorthand rhs uses -r_{var} symbols
        assert "-r_{x}" in systems.full.rhs_shorthand
        # delta definitions present for the reductions
        assert "\\Delta" in systems.augmented.delta_definitions

    def test_problem_rendering(self):
        s = render_problem(Settings(), ProblemStage.SLACKED)
        assert "\\text{minimize}" in s and "\\text{subject to}" in s
        assert "0.5 x^T Q x + c^T x" in s
        barrier = render_problem(Settings(),
                                 ProblemStage.SLACKED_WITH_BARRIERS)
        assert "\\log" in barrier

    def test_lagrangian_and_kkt(self):
        lag = render_lagrangian(Settings())
        assert "\\lambda" in lag and "\\log" in lag
        kkt = render_first_order_conditions(Settings())
        assert "&= 0" in kkt

    def test_bounds_none_renders_empty_constraints(self):
        s = render_problem(Settings(inequalities=Bounds.NONE,
                                    variable_bounds=Bounds.NONE))
        assert "\\leq" not in s


class TestWeb:
    def test_generate_site(self, tmp_path):
        from ipmzoo_tpu.frontend.web import generate_site
        out = str(tmp_path / "site")
        generate_site(out)
        assert os.path.exists(os.path.join(out, "index.html"))
        with open(os.path.join(out, "derivations.json")) as f:
            data = json.load(f)
        assert len(data) == 336
        assert all("error" not in v for v in data.values())
        sample = data["both|both|0|none|slacked_slacks"]
        assert "problem" in sample and "systems" in sample
        assert sample["systems"]["augmented"]["lhs"]


class TestCLI:
    def _run(self, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        return subprocess.run(
            [sys.executable, "-m", "ipmzoo_tpu.frontend.cli", *args],
            capture_output=True, text=True, env=env, timeout=500)

    def test_symbolic_demo(self):
        out = self._run("-o")
        assert out.returncode == 0
        assert "Augmented system lhs" in out.stdout
        assert "Normal equations lhs" in out.stdout

    def test_basic_and_eval_demos(self):
        out = self._run("-b", "-e")
        assert out.returncode == 0
        assert "d/dx" in out.stdout
        assert "1/2 x^T Q x = " in out.stdout

    def test_latex_flag(self):
        out = self._run("--latex")
        assert out.returncode == 0
        assert "% problem" in out.stdout
        assert "\\text{minimize}" in out.stdout
