from instarevive_tpu.pipelines.restore import RestorationPipeline  # noqa: F401
