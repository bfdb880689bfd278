import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """ONE Ray session for the whole pytest run (per TESTDATA/driver contract)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_images_dir(ray_session):
    """Cached ~1k-row synthetic images table."""
    from tiff_enrichment_pipeline_ray.sources import synth

    return synth.ensure_images(0.0005)


@pytest.fixture(scope="session")
def layers_dir(ray_session):
    from tiff_enrichment_pipeline_ray.sources import synth

    return synth.ensure_layers()


@pytest.fixture(scope="session")
def flag_out(tiny_images_dir, layers_dir, tmp_path_factory):
    """One flagship run shared by the e2e assertions."""
    from tiff_enrichment_pipeline_ray.pipelines import flagship

    out = str(tmp_path_factory.mktemp("flag"))
    summary = flagship.run_flagship(tiny_images_dir, out, resume=False)
    return out, summary
