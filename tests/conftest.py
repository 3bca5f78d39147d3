"""Test configuration: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4: the distributed-consistency tier the
reference lacks)."""
import os

os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'

import jax

jax.config.update('jax_platforms', 'cpu')


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: long-running end-to-end simulations')


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False,
                     help='run the slow-marked marathon simulations (SPH dam 3000 steps, '
                          'cylinder wake 340 steps); short smoke variants always run')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow') or config.getoption('-m'):
        return  # explicit marker expressions manage their own selection
    import pytest
    skip_slow = pytest.mark.skip(reason='marathon simulation: pass --runslow to include')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip_slow)
