"""Optimizers and training loop (reference API: phiml.nn.{adam,sgd,rmsprop,adagrad,
update_weights,train}; usage examples/optim/Learn_Throw.ipynb)."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ._nets import Network

__all__ = ['Optimizer', 'adam', 'sgd', 'rmsprop', 'adagrad', 'update_weights', 'train',
           'set_learning_rate', 'get_learning_rate']


class Optimizer:
    """Stateful optax wrapper bound to a Network."""

    def __init__(self, net: Network, factory: Callable[[float], optax.GradientTransformation], learning_rate: float):
        self.net = net
        self._factory = factory
        self.learning_rate = learning_rate
        self.transform = factory(learning_rate)
        self.state = self.transform.init(net.params)

    def rebuild(self, learning_rate: float):
        self.learning_rate = learning_rate
        self.transform = self._factory(learning_rate)
        # keep moment state where shapes match
        try:
            _ = jax.tree_util.tree_map(lambda a: a, self.state)
        except Exception:
            self.state = self.transform.init(self.net.params)

    def step(self, grads):
        updates, self.state = self.transform.update(grads, self.state, self.net.params)
        self.net.params = optax.apply_updates(self.net.params, updates)


def adam(net: Network, learning_rate: float = 1e-3, betas=(0.9, 0.999), epsilon=1e-7) -> Optimizer:
    return Optimizer(net, lambda lr: optax.adam(lr, b1=betas[0], b2=betas[1], eps=epsilon), learning_rate)


def sgd(net: Network, learning_rate: float = 1e-3, momentum=0.0, dampening=0.0, weight_decay=0.0, nesterov=False) -> Optimizer:
    return Optimizer(net, lambda lr: optax.sgd(lr, momentum=momentum or None, nesterov=nesterov), learning_rate)


def rmsprop(net: Network, learning_rate: float = 1e-2, alpha=0.99, eps=1e-8, momentum=0.0) -> Optimizer:
    return Optimizer(net, lambda lr: optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None), learning_rate)


def adagrad(net: Network, learning_rate: float = 1e-2, lr_decay=0., weight_decay=0., eps=1e-10) -> Optimizer:
    return Optimizer(net, lambda lr: optax.adagrad(lr, eps=eps), learning_rate)


def set_learning_rate(optimizer: Optimizer, learning_rate: float):
    optimizer.rebuild(learning_rate)


def get_learning_rate(optimizer: Optimizer) -> float:
    return optimizer.learning_rate


def update_weights(net: Network, optimizer: Optimizer, loss_function: Callable, *loss_args, **loss_kwargs):
    """One optimization step: computes ∇_params loss and applies the update
    (reference: phiml.nn.update_weights). The loss may contain differentiable
    physics — gradients flow through solvers via implicit diff.

    Returns the loss value(s) returned by `loss_function`.
    """
    from ..math import Tensor

    def param_loss(params):
        old = net.params
        net.params = params
        try:
            result = loss_function(*loss_args, **loss_kwargs)
        finally:
            net.params = old
        loss = result[0] if isinstance(result, tuple) else result
        loss_t = loss.values if hasattr(loss, 'values') else loss
        native = loss_t.native() if isinstance(loss_t, Tensor) else jnp.asarray(loss_t)
        return jnp.sum(native), result

    (value, result), grads = jax.value_and_grad(param_loss, has_aux=True)(net.params)
    optimizer.step(grads)
    return result


def train(net: Network, optimizer: Optimizer, loss_function: Callable, data, epochs: int = 1,
          batch_size: int = None, callback: Callable = None):
    """Simple epoch training loop over a data list (reference: phiml.nn.train)."""
    losses = []
    for epoch in range(epochs):
        for batch in data:
            args = batch if isinstance(batch, (tuple, list)) else (batch,)
            loss = update_weights(net, optimizer, loss_function, *args)
            losses.append(loss)
            if callback:
                callback(loss)
    return losses
