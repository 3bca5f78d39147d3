"""Test configuration: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4: the distributed-consistency tier the
reference lacks)."""
import os

os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'

import jax

jax.config.update('jax_platforms', 'cpu')


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: long-running end-to-end simulations')
