"""dryrun_multichip child-retry discrimination (VERDICT r3 weak #5).

The retry exists ONLY for the XLA collective-rendezvous watchdog SIGABRT on
core-starved hosts; a deterministic crash that also dies by signal must be
reported on the first attempt, not masked by retries.  These tests inject
tiny child programs (no jax import — fast) through the ``code`` hook.
"""
import importlib.util
import os
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_for_tests", os.path.join(REPO, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _counting(tmp_path, body: str) -> str:
    """Child program that bumps an attempt counter, then runs ``body``."""
    cnt = os.path.join(str(tmp_path), "attempts")
    return cnt, (
        "import os\n"
        f"p = {cnt!r}\n"
        "n = int(open(p).read()) + 1 if os.path.exists(p) else 1\n"
        "open(p, 'w').write(str(n))\n" + body)


def _attempts(cnt: str) -> int:
    return int(open(cnt).read())


def test_non_watchdog_abort_is_not_retried(graft, tmp_path):
    """A plain os.abort() (no watchdog signature in stderr) fails on the
    FIRST attempt."""
    cnt, code = _counting(tmp_path, "os.abort()\n")
    with pytest.raises(RuntimeError, match="no XLA-watchdog signature"):
        graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 1


def test_python_exception_is_not_retried(graft, tmp_path):
    cnt, code = _counting(tmp_path, "raise SystemExit(2)\n")
    with pytest.raises(RuntimeError, match="rc=2"):
        graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 1


def test_watchdog_abort_is_retried_then_exhausted(graft, tmp_path):
    """The watchdog signature in stderr + signal death is retried up to
    the attempt bound (bounded — VERDICT asked to verify it is)."""
    cnt, code = _counting(tmp_path, (
        "import sys\n"
        "print('E0819 Thread is unstuck! ... timeout is too short',"
        " file=sys.stderr, flush=True)\n"
        "os.abort()\n"))
    with pytest.raises(RuntimeError, match="retries exhausted"):
        graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 3


def test_watchdog_abort_then_success(graft, tmp_path):
    """Flaky watchdog death on attempt 1, clean run on attempt 2."""
    cnt, code = _counting(tmp_path, (
        "import sys\n"
        "if n == 1:\n"
        "    print('Thread is unstuck!', file=sys.stderr, flush=True)\n"
        "    os.abort()\n"))
    graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 2


def test_aot_cache_death_retried_once_without_cache(graft, tmp_path):
    """A signal death after cpu_aot_loader activity (a possibly-poisoned
    cross-host persistent-cache entry) is retried once with
    MML_NO_COMPILE_CACHE=1; success on the cacheless attempt."""
    cnt, code = _counting(tmp_path, (
        "import sys\n"
        "if os.environ.get('MML_NO_COMPILE_CACHE') != '1':\n"
        "    print('E0101 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
        "result.', file=sys.stderr, flush=True)\n"
        "    os.abort()\n"))
    graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 2


def test_aot_cache_death_reproducing_without_cache_fails(graft, tmp_path):
    """If the crash reproduces WITHOUT the cache, it is reported as a
    deterministic crash (one cacheless retry, then fail)."""
    cnt, code = _counting(tmp_path, (
        "import sys\n"
        "print('E0101 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result.',"
        " file=sys.stderr, flush=True)\n"
        "os.abort()\n"))
    with pytest.raises(RuntimeError, match="no XLA-watchdog signature"):
        graft._run_dryrun_child(8, attempts=3, code=code)
    assert _attempts(cnt) == 2
