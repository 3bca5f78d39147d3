from phiflow_tpu.math import (
    Shape, batch, spatial, channel, instance, dual, merge_shapes, concat_shapes, EMPTY_SHAPE,
)


def test_constructors():
    s = spatial(x=64, y=32)
    assert s.names == ('x', 'y')
    assert s.sizes == (64, 32)
    assert s.volume == 64 * 32
    assert spatial('x,y').names == ('x', 'y')
    assert batch(b=10).dims[0].is_batch
    d = dual(vector='x,y')
    assert d.names == ('~vector',)
    assert d.get_labels('~vector') == ('x', 'y')


def test_labels():
    v = channel(vector='x,y,z')
    assert v.get_size('vector') == 3
    assert v.get_labels('vector') == ('x', 'y', 'z')


def test_filtering():
    s = batch(b=2) & spatial(x=4, y=3) & channel(vector='x,y')
    assert s.spatial.names == ('x', 'y')
    assert s.non_batch.names == ('x', 'y', 'vector')
    assert s.only('x,vector').names == ('x', 'vector')
    assert s.without('x').names == ('b', 'y', 'vector')
    assert (s - 'b').names == ('x', 'y', 'vector')


def test_merge():
    a = spatial(x=4)
    b = spatial(y=3) & channel(vector=2)
    m = merge_shapes(a, b)
    assert set(m.names) == {'x', 'y', 'vector'}
    # batch dims sort first
    m2 = merge_shapes(spatial(x=4), batch(b=2))
    assert m2.names[0] == 'b'


def test_arithmetic():
    assert (spatial(x=64) + 1).sizes == (65,)


def test_indexing():
    s = spatial(x=4, y=3)
    assert s['x'].size == 4
    assert s[0].name == 'x'
    assert s.reversed.names == ('y', 'x')
