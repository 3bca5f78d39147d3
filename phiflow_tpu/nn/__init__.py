"""phiflow_tpu.nn — neural-network API for differentiable-physics training
(reference: phiml.nn + per-backend nets, SURVEY.md §2.1 "NN API";
call sites /root/reference/phi/torch/flow.py:19-26, examples/optim/*).

Built on flax.linen modules + optax optimizers, wrapped in stateful `Network` /
`Optimizer` handles so the reference's imperative API
(`net = u_net(...); opt = adam(net); update_weights(net, opt, loss, *data)`)
works unchanged. `math.native_call(net, x)` bridges named-dim tensors to the
channels-last native layout.
"""
from ._nets import (
    Network, dense_net, mlp, u_net, conv_net, res_net, conv_classifier, invertible_net,
    parameter_count, get_parameters, save_state, load_state,
)
from ._optim import (
    Optimizer, adam, sgd, rmsprop, adagrad, update_weights, train,
    set_learning_rate, get_learning_rate,
)
