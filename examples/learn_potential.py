"""Learn a potential landscape with a dense network
(reference recipe: examples/optim/Learn_Potential.ipynb).

Fits cos(|pos|) sampled on a 100x100 grid with a 2-32-64-32-1 MLP using Adam,
through the framework's native_call / update_weights training loop.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution

from phiflow_tpu.flow import *
from phiflow_tpu import nn


def potential(pos):
    return math.cos(math.vec_length(pos))


landscape = CenteredGrid(potential, x=100, y=100, bounds=Box(x=(-5, 5), y=(-5, 5)))

math.seed(0)
net = nn.dense_net(2, 1, [32, 64, 32])
optimizer = nn.adam(net)

input_data = math.rename_dims(landscape.points, math.spatial, math.batch)
labels = math.rename_dims(landscape.values, math.spatial, math.batch)


def loss_function(x, label):
    prediction = math.native_call(net, x)
    return math.l2_loss(prediction - label), prediction


loss0 = float(math.sum(loss_function(input_data, labels)[0], math.batch))
losses = []
for i in range(200):
    loss, _pred = nn.update_weights(net, optimizer, loss_function, input_data, labels)
    losses.append(float(math.sum(loss, math.batch)))
print(f"loss: {loss0:.4f} -> {losses[-1]:.6f} after {len(losses)} Adam steps")
assert losses[-1] < loss0 * 0.1, "network failed to fit the landscape"

if __name__ == '__main__' and not bool(int(__import__('os').environ.get('PHIFLOW_NO_PLOT', '1'))):
    prediction = math.rename_dims(math.native_call(net, input_data), math.batch, math.spatial)
    vis.plot([landscape, landscape.with_values(prediction)])
    vis.show()
