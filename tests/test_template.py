"""Boilerplate test for challenge participants (reference
tests/test_template.py:5-11): copy, rename, and fill in tests for your
submission agent.  Runs under pytest or as a script."""

import argparse
import unittest


class TestSomething(unittest.TestCase):
    def test_something(self):
        # This is where you test something, e.g. drive your agent:
        #   from carle_tpu import CARLE
        #   from carle_tpu.evaluation.submission import SubmissionAgent
        #   env, agent = CARLE(), SubmissionAgent()
        #   obs = env.reset()
        #   obs, reward, done, info = env.step(agent(obs))
        self.assertTrue(True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-v", "--verbosity", default=0,
        help="Verbosity: 0 (quiet, default), 1 (timid), or 2 (noisy)",
    )
    args = parser.parse_args()
    unittest.main(verbosity=int(args.verbosity))
