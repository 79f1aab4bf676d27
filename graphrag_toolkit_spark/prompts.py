"""Prompt providers (SURVEY §2.10 "custom prompts" row; reference
``prompts/`` package: static / file / s3 / bedrock providers behind one
``get_system_prompt``/``get_user_prompt`` contract plus a registry).

Spark-side providers are driver-side plain objects — prompts parameterize
the injected LLM callables, they never run on executors. The s3 provider is
the file provider pointed at an ``s3a://`` path read through Hadoop's
filesystem API (the same abstraction the data readers use), so no cloud SDK
dependency appears; the managed-prompt-service provider has no public
equivalent in this environment and fails fast at lookup like the stubbed
binary readers.
"""

from __future__ import annotations

import os
import string


class StaticPromptProvider:
    """Fixed prompt pair (reference ``static_prompt_provider.py``)."""

    def __init__(self, system_prompt: str, user_prompt: str):
        self._system = system_prompt
        self._user = user_prompt

    def get_system_prompt(self) -> str:
        return self._system

    def get_user_prompt(self) -> str:
        return self._user


class FilePromptProvider:
    """Prompts from a directory (reference ``file_prompt_provider.py``):
    ``<base>/system_prompt.txt`` + ``<base>/user_prompt.txt``."""

    def __init__(
        self,
        base_path: str,
        system_prompt_file: str = "system_prompt.txt",
        user_prompt_file: str = "user_prompt.txt",
    ):
        if not os.path.isdir(base_path):
            raise NotADirectoryError(
                f"Invalid or non-existent directory: {base_path}"
            )
        self.base_path = base_path
        self.system_prompt_file = system_prompt_file
        self.user_prompt_file = user_prompt_file

    def _load(self, filename: str) -> str:
        with open(os.path.join(self.base_path, filename), encoding="utf-8") as f:
            return f.read()

    def get_system_prompt(self) -> str:
        return self._load(self.system_prompt_file)

    def get_user_prompt(self) -> str:
        return self._load(self.user_prompt_file)


class SparkPathPromptProvider:
    """Prompts from ANY Hadoop-visible path (``s3a://`` / ``hdfs://`` /
    ``file://``) — the s3 provider leg without a cloud SDK: the same
    filesystem abstraction the parquet readers use fetches the two prompt
    files through the active SparkContext."""

    def __init__(
        self,
        spark,
        base_path: str,
        system_prompt_file: str = "system_prompt.txt",
        user_prompt_file: str = "user_prompt.txt",
    ):
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.system_prompt_file = system_prompt_file
        self.user_prompt_file = user_prompt_file

    def _load(self, filename: str) -> str:
        # wholetext keeps the file as ONE row regardless of newlines
        rows = (
            self.spark.read.format("text")
            .option("wholetext", True)
            .load(f"{self.base_path}/{filename}")
            .collect()
        )
        return rows[0]["value"] if rows else ""

    def get_system_prompt(self) -> str:
        return self._load(self.system_prompt_file)

    def get_user_prompt(self) -> str:
        return self._load(self.user_prompt_file)


def render(template: str, **values) -> str:
    """Safe template substitution (``$name`` placeholders, reference uses
    ``string.Template`` in format_sources): unknown placeholders survive
    verbatim instead of raising mid-pipeline."""
    return string.Template(template).safe_substitute(**values)


def provider_for(kind: str, **kwargs):
    """Registry (reference ``prompt_provider_factory.py``): static | file |
    spark-path. The managed-prompt-service provider ('bedrock') has no
    public-environment equivalent — fails fast at lookup, mirroring the
    honest-stub policy of ``sources/readers.py``."""
    if kind == "static":
        return StaticPromptProvider(**kwargs)
    if kind == "file":
        return FilePromptProvider(**kwargs)
    if kind == "spark-path":
        return SparkPathPromptProvider(**kwargs)
    if kind == "bedrock":
        raise NotImplementedError(
            "managed prompt service provider needs a cloud SDK not present "
            "in this environment; stage prompts to a file/spark-path "
            "provider instead"
        )
    raise ValueError(
        f"unknown prompt provider {kind!r}; available: static, file, "
        f"spark-path (bedrock is a stub)"
    )
