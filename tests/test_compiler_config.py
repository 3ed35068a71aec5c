"""configure_compiler: default, explicit, env-override, env-disable."""
import jax
import pytest

from pmf_tpu.utils.compiler import DEFAULT_EFFORT, configure_compiler

pytestmark = pytest.mark.smoke


@pytest.fixture(autouse=True)
def _restore():
    prev = jax.config.jax_exec_time_optimization_effort
    yield
    jax.config.update("jax_exec_time_optimization_effort", prev)


def test_default_effort(monkeypatch):
    monkeypatch.delenv("PMF_TPU_COMPILER_EFFORT", raising=False)
    configure_compiler()
    assert jax.config.jax_exec_time_optimization_effort == DEFAULT_EFFORT


def test_explicit_effort(monkeypatch):
    monkeypatch.delenv("PMF_TPU_COMPILER_EFFORT", raising=False)
    configure_compiler(-0.3)
    assert jax.config.jax_exec_time_optimization_effort == pytest.approx(-0.3)


def test_env_override(monkeypatch):
    monkeypatch.setenv("PMF_TPU_COMPILER_EFFORT", "-0.9")
    configure_compiler(-0.3)  # env wins over the argument
    assert jax.config.jax_exec_time_optimization_effort == pytest.approx(-0.9)


def test_env_none_disables(monkeypatch):
    prev = jax.config.jax_exec_time_optimization_effort
    monkeypatch.setenv("PMF_TPU_COMPILER_EFFORT", "none")
    configure_compiler()
    assert jax.config.jax_exec_time_optimization_effort == prev
