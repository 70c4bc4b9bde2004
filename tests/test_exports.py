import pytest
pytestmark = pytest.mark.fast

def test_top_level_exports():
    import alg_tpu
    assert callable(alg_tpu.serve_batch)
    assert callable(alg_tpu.load_pipeline)
    assert alg_tpu.BatchRequest(prompt="x", image=None).seed == 42
    assert "WanPipeline" in dir(alg_tpu)
    with pytest.raises(AttributeError):
        alg_tpu.nope
