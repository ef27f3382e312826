"""Data layer: feature datasets, video clip samplers, image pipelines, GT builders."""
